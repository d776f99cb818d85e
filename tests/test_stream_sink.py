"""Streaming sink into engine tables (streaming/sink.py): exactly-once per
(stream, epoch) across replays, append-mode windowed rollups, and the
update-mode upsert shape converging to the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.streaming.sink import (
    applied_batches, table_sink, write_stream_to_table,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.streaming.window_agg import (
    windowed_agg_batch, windowed_agg_stream,
)

EVENT_SCHEMA = "user_id long, ts timestamp"
WIN = 100


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id long, sec long"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"))


def test_sink_exactly_once_on_replay(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"),
                     T.StructType.fromDDL(EVENT_SCHEMA))
    sink = table_sink(t, "s1")
    df = _events(spark, [(1, 10), (2, 20)])
    sink(df, 0)
    sink(df, 0)  # crash-replay of the same epoch: must be a no-op
    sink(df, 1)
    t = t.refresh()
    assert t.scan().count() == 4
    assert applied_batches(t, "s1") == {0, 1}
    assert applied_batches(t, "other") == set()


def test_two_streams_do_not_collide(spark, tmp_path):
    """Independent streams share epoch counters; stream-id namespacing must
    keep their markers apart (the 15-flow fan-in shape)."""
    t = Table.create(spark, str(tmp_path / "tbl"),
                     T.StructType.fromDDL(EVENT_SCHEMA))
    table_sink(t, "a")(_events(spark, [(1, 10)]), 0)
    table_sink(t, "b")(_events(spark, [(2, 20)]), 0)  # same epoch id
    assert t.refresh().scan().count() == 2


def test_empty_epoch_commits_nothing(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"),
                     T.StructType.fromDDL(EVENT_SCHEMA))
    table_sink(t, "s")(_events(spark, []), 0)
    t = t.refresh()
    assert t.current_snapshot() is None
    assert applied_batches(t, "s") == set()


def _run_query(spark, tmp_path, land_files, start):
    land = tmp_path / "land"
    land.mkdir()
    for name, rows in land_files:
        _events(spark, rows).coalesce(1).write.parquet(str(land / name))
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land) + "/*/")
    )
    q = start(stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_windowed_rollup_append_into_table(spark, tmp_path):
    """readStream files -> watermarked windowed agg -> engine table: the
    table ends up exactly equal to the batch rollup of the on-time input."""
    base = 10_000
    real = [(u, base + off) for u in range(3) for off in (0, 30, 99, 250)]
    rollup = Table.create(
        spark, str(tmp_path / "rollup"),
        T.StructType.fromDDL(
            "user_id long, win_start timestamp, win_end timestamp, "
            "n_events bigint"))
    _run_query(
        spark, tmp_path,
        [("f1", real), ("f2", [(99, 100_000)]), ("f3", [(99, 200_000)])],
        lambda s: write_stream_to_table(
            windowed_agg_stream(s, window_sec=WIN),
            rollup, str(tmp_path / "cp"), "rollup"),
    )
    got = sorted(
        (r["user_id"], int(r["win_start"].timestamp()), r["n_events"])
        for r in rollup.refresh().scan()
        .filter(F.col("user_id") < 90).collect())
    want = sorted(
        (r["user_id"], int(r["win_start"].timestamp()), r["n_events"])
        for r in windowed_agg_batch(_events(spark, real), window_sec=WIN)
        .collect())
    assert got == want


def test_update_mode_upsert_converges(spark, tmp_path):
    """Update-mode windowed agg + upsert keys: re-emitted growing windows
    overwrite their previous row, so the table converges to the final
    counts without waiting for the watermark to finalize anything."""
    base = 10_000
    rollup = Table.create(
        spark, str(tmp_path / "rollup"),
        T.StructType.fromDDL(
            "user_id long, win_start timestamp, win_end timestamp, "
            "n_events bigint"))
    _run_query(
        spark, tmp_path,
        # the same (1, [10000,10100)) window grows across two epochs
        [("f1", [(1, base), (1, base + 10)]),
         ("f2", [(1, base + 20), (2, base + 150)])],
        lambda s: write_stream_to_table(
            windowed_agg_stream(s, window_sec=WIN),
            rollup, str(tmp_path / "cp"), "u",
            output_mode="update",
            upsert_keys=["user_id", "win_start"]),
    )
    got = sorted(
        (r["user_id"], int(r["win_start"].timestamp()), r["n_events"])
        for r in rollup.refresh().scan().collect())
    assert got == [(1, base - base % WIN, 3), (2, base + 100, 1)]
