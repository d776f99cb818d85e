"""Watermarked window aggregation (streaming/window_agg.py): tumbling and
sliding batch semantics, streaming-twin parity on finalized windows, and the
late-data drop contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from e2e_ocsf_cyber_lakehouse_blueprint_spark.streaming.window_agg import (
    windowed_agg_batch,
    windowed_agg_stream,
)

EVENT_SCHEMA = "user_id long, ts timestamp"
WIN = 100  # seconds


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id long, sec long"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"))


def win_rows(df):
    return sorted(
        (r["user_id"], int(r["win_start"].timestamp()),
         int(r["win_end"].timestamp()))
        + tuple(r[c] for c in df.columns
                if c not in ("user_id", "win_start", "win_end"))
        for r in df.collect()
    )


def test_tumbling_epoch_aligned(spark):
    rows = [(1, 0), (1, 99), (1, 100), (2, 250)]
    out = win_rows(windowed_agg_batch(
        _events(spark, rows), window_sec=WIN))
    assert out == [
        (1, 0, 100, 2),      # 0 and 99 share the [0,100) bucket
        (1, 100, 200, 1),    # 100 starts the next bucket (half-open)
        (2, 200, 300, 1),
    ]


def test_sliding_window_multiplicity(spark):
    # window 100, slide 50: each event lands in exactly 2 windows
    out = win_rows(windowed_agg_batch(
        _events(spark, [(1, 75)]), window_sec=WIN, slide_sec=50))
    assert out == [(1, 0, 100, 1), (1, 50, 150, 1)]


def test_custom_aggs(spark):
    rows = [(1, 10), (1, 20), (1, 110)]
    out = windowed_agg_batch(
        _events(spark, rows), window_sec=WIN,
        aggs={"n": F.count(F.lit(1)),
              "last_ts": F.max("ts")},
    )
    got = {(r["user_id"], int(r["win_start"].timestamp())):
           (r["n"], int(r["last_ts"].timestamp())) for r in out.collect()}
    assert got == {(1, 0): (2, 20), (1, 100): (1, 110)}


def _run_stream(spark, tmp_path, land_files, **kw):
    land = tmp_path / "land"
    land.mkdir()
    for name, rows in land_files:
        _events(spark, rows).coalesce(1).write.parquet(str(land / name))
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land) + "/*/")
    )
    out = windowed_agg_stream(stream, window_sec=WIN, **kw)
    q = (
        out.writeStream.format("memory").queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("win_out")


def test_stream_matches_batch_finalized_windows(spark, tmp_path):
    base = 10_000
    real = [(u, base + off) for u in range(3) for off in (0, 30, 99, 100, 250)]
    batch1 = [r for r in real if r[1] < base + 100]
    batch2 = [r for r in real if r[1] >= base + 100]
    got_df = _run_stream(
        spark, tmp_path,
        [("f1", batch1), ("f2", batch2),
         # sentinels: advance the watermark far past every real window,
         # then give the engine one more batch in which to emit them
         ("f3", [(99, 100_000)]), ("f4", [(99, 200_000)])],
    )
    got = win_rows(got_df.filter(F.col("user_id") < 90))
    want = win_rows(windowed_agg_batch(_events(spark, real), window_sec=WIN))
    assert got == want
    assert len(got) == 9  # 3 users x 3 windows


def test_stream_drops_late_event_after_finalization(spark, tmp_path):
    """An event arriving after its window was finalized and emitted must be
    dropped — it can neither bump the emitted count nor re-emit the window
    as a duplicate row (append-mode exactly-once per window).

    Spark's drop guarantee is one-sided: a late row landing in the very
    first batch after the watermark jump may still merge, because the
    input-side late filter uses the PREVIOUS batch's watermark (only
    eviction uses the new one). Hence TWO sentinel batches before the late
    row: the first advances the watermark, the second finalizes + emits the
    window, and only then does the late event arrive."""
    base = 10_000
    got_df = _run_stream(
        spark, tmp_path,
        [("f1", [(1, base), (1, base + 10)]),
         ("f2", [(99, 100_000)]),          # watermark -> 100_000
         ("f3", [(99, 100_050)]),          # window [10000,10100) emitted
         ("f4", [(1, base + 20)]),         # late: must be dropped
         ("f5", [(99, 200_000)]),
         ("f6", [(99, 300_000)])],
    )
    rows = [(r["user_id"], int(r["win_start"].timestamp()), r["n_events"])
            for r in got_df.filter(F.col("user_id") < 90).collect()]
    assert rows == [(1, base - base % WIN, 2)]  # one row, on-time count only


def test_stream_sliding_parity(spark, tmp_path):
    base = 10_000
    real = [(1, base + 25), (1, base + 75), (2, base + 120)]
    got_df = _run_stream(
        spark, tmp_path,
        [("f1", real), ("f2", [(99, 100_000)]), ("f3", [(99, 200_000)])],
        slide_sec=50,
    )
    got = win_rows(got_df.filter(F.col("user_id") < 90))
    want = win_rows(windowed_agg_batch(
        _events(spark, real), window_sec=WIN, slide_sec=50))
    assert got == want
