"""Atomic UPSERT (row-delta commit): last-writer-wins by key in ONE
snapshot, O(batch) cost, streaming micro-batch integration, and interplay
with maintenance rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.rewrite_deletes import (
    RewriteDeletesJob,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.upsert import upsert
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.streaming.incremental import (
    IncrementalTableReader, run_micro_batches,
)


def make_table(spark, loc, df):
    t = Table.create(
        spark, loc, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts"), bucket("cb", "conv_id", 2)),
        properties={"write.target-file-size-bytes": str(512 * 1024),
                    "stats.columns": "conv_id,turn_idx,role,tool,ts"},
    )
    t.append(df, n_files=2, sort_within=("conv_id", "turn_idx"))
    return t


def rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in df.select("conv_id", "turn_idx", "text").collect()
    )


@pytest.fixture()
def base(spark):
    return generate_transcripts(
        spark, n_convs=30, hot_convs=1, span_days=3, seed=57).cache()


def test_upsert_replaces_matching_keys_in_one_snapshot(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    n_snaps = len(t.snapshots)
    batch = (base.filter(F.col("turn_idx") < 2)
             .withColumn("text", F.concat(F.lit("v2:"), F.col("text"))))
    res = upsert(t, batch, ["conv_id", "turn_idx"])
    assert len(t.snapshots) == n_snaps + 1  # ONE commit for delete + append
    assert res.rows_appended == batch.count()
    expected = rows(base.filter(F.col("turn_idx") >= 2)) + rows(batch)
    assert rows(t.scan()) == sorted(expected)


def test_upsert_inserts_new_keys(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    fresh = base.limit(5).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("-new")))
    upsert(t, fresh, ["conv_id", "turn_idx"])
    assert rows(t.scan()) == sorted(rows(base) + rows(fresh))


def test_upsert_last_writer_wins_across_batches(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    key = base.select("conv_id", "turn_idx").first()
    row = base.filter((F.col("conv_id") == key["conv_id"])
                      & (F.col("turn_idx") == key["turn_idx"]))
    for i in range(3):
        upsert(t, row.withColumn("text", F.lit(f"gen-{i}")),
               ["conv_id", "turn_idx"])
    got = (t.scan().filter((F.col("conv_id") == key["conv_id"])
                           & (F.col("turn_idx") == key["turn_idx"]))
           .select("text").collect())
    assert [r["text"] for r in got] == ["gen-2"]


def test_upsert_survives_maintenance(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    batch = (base.filter(F.col("turn_idx") == 0)
             .withColumn("text", F.lit("patched")))
    upsert(t, batch, ["conv_id", "turn_idx"])
    before = rows(t.scan())
    RewriteDeletesJob(t, min_input_files=1).run()
    assert rows(t.scan()) == before
    CompactionJob(t, min_input_files=1).run()
    assert rows(t.scan()) == before


def test_streaming_upsert_micro_batches_exactly_once(spark, tmp_path, base):
    """Drain an incremental reader into an upsert sink twice with the same
    checkpoint: the second drain must be a no-op (batch-id idempotence),
    and replayed keys converge to the source's final version."""
    src_t = make_table(spark, str(tmp_path / "src"), base)
    dst = Table.create(
        spark, str(tmp_path / "dst"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"write.target-file-size-bytes": str(512 * 1024)},
    )
    reader = IncrementalTableReader(src_t, str(tmp_path / "ckpt"))
    assert run_micro_batches(reader, dst,
                             upsert_keys=["conv_id", "turn_idx"],
                             n_files=1) == 1
    # second source commit REPLAYS turn 0 rows with corrected text
    fixed = (base.filter(F.col("turn_idx") == 0)
             .withColumn("text", F.concat(F.lit("fix:"), F.col("text"))))
    src_t.append(fixed, n_files=1)
    assert run_micro_batches(reader, dst,
                             upsert_keys=["conv_id", "turn_idx"],
                             n_files=1) == 1
    expected = sorted(rows(base.filter(F.col("turn_idx") > 0)) + rows(fixed))
    assert rows(dst.scan()) == expected
    # idempotent re-drain from a FRESH checkpoint: batch ids already applied
    reader2 = IncrementalTableReader(src_t, str(tmp_path / "ckpt2"))
    assert run_micro_batches(
        reader2, dst, upsert_keys=["conv_id", "turn_idx"]) == 0
    assert rows(dst.scan()) == expected
