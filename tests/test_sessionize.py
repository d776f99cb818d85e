"""Sessionization: batch gaps-and-islands vs the applyInPandasWithState
streaming twin. Closed sessions must agree exactly; the stream holds open
sessions in state and flushes them on event-time-watermark timeout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e2e_ocsf_cyber_lakehouse_blueprint_spark.streaming.sessionize import (
    closed_sessions_batch,
    sessionize_batch,
    sessionize_stream,
)

GAP = 100  # seconds

EVENT_SCHEMA = "user_id long, ts timestamp"


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id long, sec long"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"))


def session_rows(df):
    return sorted(
        (r["user_id"], r["session_idx"], r["n_events"],
         r["start_ts"], r["end_ts"], r["duration_sec"])
        for r in df.collect()
    )


def test_batch_sessionize_boundaries(spark):
    rows = [(1, 0), (1, 30), (1, 60), (1, 1000), (1, 1030),
            (2, 5), (2, 105), (2, 206)]  # gap exactly 100 does NOT split
    out = session_rows(sessionize_batch(_events(spark, rows), gap_sec=GAP))
    assert [(u, i, n, int(d.timestamp()) - 0, int(e.timestamp()),
             dur) for u, i, n, d, e, dur in out] == [
        (1, 1, 3, 0, 60, 60),
        (1, 2, 2, 1000, 1030, 30),
        (2, 1, 2, 5, 105, 100),   # 100s gap == GAP -> same session
        (2, 2, 1, 206, 206, 0),   # 101s gap -> new session
    ]


def test_closed_sessions_watermark_filter(spark):
    rows = [(1, 0), (1, 30), (1, 1000)]
    df = _events(spark, rows)
    all_s = session_rows(sessionize_batch(df, gap_sec=GAP))
    assert len(all_s) == 2
    closed = session_rows(
        closed_sessions_batch(df, gap_sec=GAP,
                              watermark_ts="1970-01-01 00:05:00"))
    # watermark 300s: session(0..30) closed at 130 <= 300; session(1000) open
    assert len(closed) == 1 and closed[0][1] == 1


@pytest.mark.parametrize("files_per_trigger", [1])
def test_stream_matches_batch_closed_sessions(spark, tmp_path,
                                              files_per_trigger):
    land = tmp_path / "land"
    land.mkdir()
    # keep ts well away from epoch 0: a row AT the initial watermark (0)
    # is dropped as late by the stateful operator
    base0 = 10_000
    real = [
        (u, base0 + base + off)
        for u in range(4)
        for base, offs in ((u, (0, 30, 60)), (1000 + u, (0, 30)))
        for off in offs
    ]
    batch1 = [(u, t) for u, t in real if t < base0 + 500]
    batch2 = [(u, t) for u, t in real if t >= base0 + 500]

    def land_file(name, rows):
        _events(spark, rows).coalesce(1).write.parquet(str(land / name))

    land_file("f1", batch1)
    land_file("f2", batch2)
    # two sentinel batches: the first advances the watermark past every real
    # session's (end + gap); the second gives the engine a batch in which
    # those event-time timeouts actually fire
    land_file("f3", [(99, 100_000)])
    land_file("f4", [(99, 200_000)])

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(str(land) + "/*/")
    )
    out = sessionize_stream(stream, gap_sec=GAP)
    q = (
        out.writeStream.format("memory").queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = session_rows(
        spark.table("sess_out").filter(F.col("user_id") < 90))
    want = session_rows(
        sessionize_batch(_events(spark, real), gap_sec=GAP))
    assert got == want
    assert len(got) == 8  # 2 sessions x 4 users


def test_stream_state_survives_multi_batch_session(spark, tmp_path):
    """A session spanning micro-batches merges in state instead of splitting."""
    land = tmp_path / "land"
    land.mkdir()
    _events(spark, [(7, 1000), (7, 1050)]).coalesce(1) \
        .write.parquet(str(land / "f1"))
    _events(spark, [(7, 1120)]).coalesce(1) \
        .write.parquet(str(land / "f2"))  # 70s after 1050 -> same session
    _events(spark, [(99, 50_000)]).coalesce(1).write.parquet(str(land / "f3"))
    _events(spark, [(99, 90_000)]).coalesce(1).write.parquet(str(land / "f4"))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land) + "/*/")
    )
    q = (
        sessionize_stream(stream, gap_sec=GAP)
        .writeStream.format("memory").queryName("sess_multi")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = session_rows(spark.table("sess_multi").filter(F.col("user_id") == 7))
    assert len(got) == 1
    u, idx, n, start, end, dur = got[0]
    assert (n, int(start.timestamp()), int(end.timestamp()), dur) == (3, 1000, 1120, 120)
