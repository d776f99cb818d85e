"""Rewrite vs concurrent delete: the Iceberg RewriteDataFiles race.

A delete committed between a rewrite's READ and its COMMIT must never be
silently folded away. Pure reorganizations (compaction / clustering) resolve
it with starting-sequence preservation (outputs keep the plan-time sequence,
so the newer delete still applies to them — Iceberg useStartingSequenceNumber);
row-changing rewrites (CoW DELETE / UPDATE / MERGE) and any rewrite racing a
positional delete abort with CommitConflict instead (the posdel's row
positions refer to files the rewrite retires).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import e2e_ocsf_cyber_lakehouse_blueprint_spark.format.snapshot as snap_mod
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import CommitConflict, Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import ClusteringJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import (
    DeleteJob, equality_delete,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.update import UpdateJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


@pytest.fixture()
def base(spark):
    return generate_transcripts(spark, n_convs=24, hot_convs=2, span_days=3)


def make_table(spark, loc, df):
    t = Table.create(
        spark, loc, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts"), bucket("cb", "conv_id", 2)),
        properties={
            "write.target-file-size-bytes": str(512 * 1024),
            "stats.columns": "conv_id,turn_idx,role,tool,ts",
        },
    )
    t.append(df, n_files=3, sort_within=("conv_id", "turn_idx"))
    return t


def race_once(monkeypatch, interloper):
    """Arrange for ``interloper(fresh_table_handle_factory)`` to commit FIRST,
    inside the victim's commit attempt (same pattern as
    test_eqdel_retry_after_lost_race_gets_fresh_sequence)."""
    orig = snap_mod.commit_metadata
    state = {"raced": False}

    def racing(meta):
        if not state["raced"]:
            state["raced"] = True
            interloper()
        return orig(meta)

    monkeypatch.setattr(snap_mod, "commit_metadata", racing)
    return state


def victims_of(df, n=3):
    return sorted({r["conv_id"] for r in
                   df.select("conv_id").distinct().limit(n).collect()})


def test_compaction_preserves_concurrent_eqdel(spark, tmp_path, base, monkeypatch):
    """An equality delete that lands between compaction's read and commit
    still applies to the compacted outputs: they keep the STARTING sequence
    instead of being re-stamped past the delete (no row resurrection)."""
    loc = str(tmp_path / "t")
    t = make_table(spark, loc, base)
    start_seq = t.current_snapshot().sequence_number
    victims = victims_of(base)
    keys = spark.createDataFrame([(v,) for v in victims], "conv_id string")

    race_once(monkeypatch, lambda: equality_delete(Table.load(spark, loc), keys))
    CompactionJob(t, max_concurrency=2).run()

    t.refresh()
    outs = t.live_data_files()
    assert outs and all(f.data_sequence == start_seq for f in outs)
    # the concurrent delete is newer than the preserved outputs: still live,
    # still applied at scan time
    assert t.live_eq_delete_files()
    assert t.scan().filter(F.col("conv_id").isin(victims)).count() == 0
    # a later (un-raced) rewrite folds it and retires the dead eqdel
    expected = t.scan().count()
    ClusteringJob(t, curve="zorder", max_concurrency=2).run()
    t.refresh()
    assert not t.live_eq_delete_files()
    assert t.scan().count() == expected
    assert t.scan().filter(F.col("conv_id").isin(victims)).count() == 0


def test_cow_delete_aborts_on_concurrent_eqdel(spark, tmp_path, base, monkeypatch):
    """A row-changing rewrite cannot preserve sequences (its outputs are new
    rows): racing an overlapping equality delete must abort, not fold the
    delete away."""
    loc = str(tmp_path / "t")
    t = make_table(spark, loc, base)
    victims = victims_of(base)
    keys = spark.createDataFrame([(v,) for v in victims], "conv_id string")

    race_once(monkeypatch, lambda: equality_delete(Table.load(spark, loc), keys))
    with pytest.raises(CommitConflict, match="equality delete"):
        DeleteJob(t, [("role", "=", "tool")], mode="copy-on-write").run()


def test_update_aborts_on_concurrent_eqdel(spark, tmp_path, base, monkeypatch):
    loc = str(tmp_path / "t")
    t = make_table(spark, loc, base)
    victims = victims_of(base)
    keys = spark.createDataFrame([(v,) for v in victims], "conv_id string")

    race_once(monkeypatch, lambda: equality_delete(Table.load(spark, loc), keys))
    with pytest.raises(CommitConflict, match="equality delete"):
        UpdateJob(t, [("role", "=", "tool")], {"tool": "'x'"}).run()


def test_compaction_aborts_on_concurrent_posdel(spark, tmp_path, base, monkeypatch):
    """A merge-on-read DELETE that lands mid-compaction writes positional
    deletes pinned to the files compaction is retiring: committing anyway
    would strand those row positions, so the rewrite must abort."""
    loc = str(tmp_path / "t")
    t = make_table(spark, loc, base)

    def interloper():
        DeleteJob(Table.load(spark, loc), [("role", "=", "tool")],
                  mode="merge-on-read").run()

    race_once(monkeypatch, interloper)
    with pytest.raises(CommitConflict, match="positional delete"):
        CompactionJob(t, max_concurrency=2).run()


def test_mor_delete_aborts_when_compaction_retires_covered_files(
        spark, tmp_path, base, monkeypatch):
    """The mirror race: the MoR delete loses — its positional-delete files
    reference paths a concurrent compaction already retired, so its commit
    must abort rather than land a delete that can never match a scan."""
    loc = str(tmp_path / "t")
    t = make_table(spark, loc, base)

    def interloper():
        other = Table.load(spark, loc)
        CompactionJob(other, max_concurrency=2).run()

    race_once(monkeypatch, interloper)
    with pytest.raises(CommitConflict):
        DeleteJob(t, [("role", "=", "tool")], mode="merge-on-read").run()


def test_unrelated_eqdel_does_not_abort_cow_delete(spark, tmp_path, base, monkeypatch):
    """Bounds narrowing: a concurrent eqdel whose keys provably miss every
    rewritten file (disjoint conv_id range) must NOT abort the rewrite."""
    loc = str(tmp_path / "t")
    t = make_table(spark, loc, base)
    # conv_ids in the generator are real strings; 'zzz-*' sorts past them all
    keys = spark.createDataFrame([("zzzz-none",)], "conv_id string")

    race_once(monkeypatch, lambda: equality_delete(Table.load(spark, loc), keys))
    before_victims = t.scan().filter(F.col("role") == "tool").count()
    assert before_victims > 0
    res = DeleteJob(t, [("role", "=", "tool")], mode="copy-on-write").run()
    assert res.snapshot_id is not None
    t.refresh()
    assert t.scan().filter(F.col("role") == "tool").count() == 0
