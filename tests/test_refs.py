"""Branches and tags (Iceberg refs): named pointers in table metadata,
branch-isolated appends, fast-forward publish, expiration pinning, GC
safety for branch-only files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.expire import (
    ExpireSnapshotsJob,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


@pytest.fixture()
def t(spark, tmp_table_dir):
    tbl = Table.create(
        spark, tmp_table_dir, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
    )
    df = generate_transcripts(spark, n_convs=20, hot_convs=0, span_days=2)
    tbl.append(df, n_files=1)
    return tbl


def _batch(spark, tag, n=5):
    df = generate_transcripts(spark, n_convs=n, hot_convs=0, span_days=2)
    return df.withColumn("conv_id", F.concat(F.lit(tag + "-"), "conv_id"))


def test_tag_pins_snapshot_against_main_changes(spark, t):
    n0 = t.scan().count()
    t.create_tag("v1")
    t.append(_batch(spark, "later"), n_files=1)
    assert t.scan().count() > n0
    assert t.scan(ref="v1").count() == n0
    assert t.ref_snapshot("v1").snapshot_id != t.current_snapshot().snapshot_id
    with pytest.raises(ValueError):
        t.create_tag("v1")  # tags are immutable, no silent replace


def test_tag_survives_expiration_until_dropped(spark, t):
    t.create_tag("pinned")
    for i in range(4):
        t.append(_batch(spark, f"b{i}", 2), n_files=1)
    n_tag = t.scan(ref="pinned").count()
    expired, _ = t.expire_snapshots(keep_last=1)
    assert expired
    assert t.scan(ref="pinned").count() == n_tag  # still resolvable
    t.drop_ref("pinned")
    t.append(_batch(spark, "post", 2), n_files=1)
    t.expire_snapshots(keep_last=1)
    with pytest.raises(KeyError):
        t.ref_snapshot("pinned")


def test_branch_appends_are_invisible_on_main(spark, t):
    n_main = t.scan().count()
    t.create_branch("dev")
    b1 = t.append_to_branch("dev", _batch(spark, "dev1"), n_files=1)
    b2 = t.append_to_branch("dev", _batch(spark, "dev2"), n_files=1)
    assert t.scan().count() == n_main
    got = t.scan(ref="dev")
    assert got.count() > n_main
    assert got.filter(F.col("conv_id").startswith("dev2-")).count() > 0
    # the ref advanced with each branch append
    assert t.ref_snapshot("dev").snapshot_id == b2.snapshot_id
    assert b2.parent_snapshot_id == b1.snapshot_id


def test_fast_forward_publishes_branch(spark, t):
    t.create_branch("dev")
    t.append_to_branch("dev", _batch(spark, "dev1"), n_files=1)
    want = sorted(r["conv_id"] for r in t.scan(ref="dev").select("conv_id").collect())
    head = t.fast_forward_main("dev")
    assert t.current_snapshot().snapshot_id == head.snapshot_id
    got = sorted(r["conv_id"] for r in t.scan().select("conv_id").collect())
    assert got == want


def test_fast_forward_refused_when_main_diverged(spark, t):
    t.create_branch("dev")
    t.append_to_branch("dev", _batch(spark, "dev1"), n_files=1)
    t.append(_batch(spark, "main1"), n_files=1)  # main moves past branch point
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward_main("dev")


def test_gc_never_deletes_branch_files(spark, t):
    t.create_branch("dev")
    t.append_to_branch("dev", _batch(spark, "dev1"), n_files=1)
    branch_files = [
        f.path for f in t.live_data_files(t.ref_snapshot("dev").snapshot_id)
    ]
    assert branch_files
    for i in range(3):
        t.append(_batch(spark, f"m{i}", 2), n_files=1)
    ExpireSnapshotsJob(t, keep_last=1).run()
    assert all(os.path.exists(p) for p in branch_files)
    assert t.scan(ref="dev").filter(
        F.col("conv_id").startswith("dev1-")).count() > 0


def test_metadata_only_commits_preserve_refs(spark, t):
    t.create_tag("keepme")
    t.set_property("foo", "bar")
    t.set_cluster_keys(["conv_id"])
    t.refresh()
    assert "keepme" in t.refs
    assert t.meta.properties["foo"] == "bar"
    # reload from disk: refs round-trip through the metadata JSON
    t2 = Table.load(spark, t.location)
    assert t2.refs["keepme"]["type"] == "tag"
