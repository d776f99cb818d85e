"""Write-audit-publish: staged append snapshots + cherry-pick publish."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.change_feed import change_feed
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.expire import (
    ExpireSnapshotsJob,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


@pytest.fixture()
def base_table(spark, tmp_table_dir):
    df = generate_transcripts(spark, n_convs=30, span_days=3)
    t = Table.create(
        spark, tmp_table_dir, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
    )
    t.append(df, n_files=2)
    return t, df


def test_stage_is_invisible_until_publish(spark, base_table):
    t, df = base_table
    base_rows = sorted(t.scan().collect())
    extra = df.filter(F.col("turn_idx") % 2 == 0).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("-wap")))
    staged = t.stage_append(extra, n_files=1)

    # invisible to plain readers; the current pointer did not move
    assert sorted(t.scan().collect()) == base_rows
    assert t.current_snapshot().snapshot_id != staged.snapshot_id
    # auditors read the staged snapshot explicitly: base + staged rows
    audit = t.scan(snapshot_id=staged.snapshot_id)
    assert audit.count() == len(base_rows) + extra.count()

    pub = t.publish_snapshot(staged.snapshot_id)
    assert t.current_snapshot().snapshot_id == pub.snapshot_id
    assert t.scan().count() == len(base_rows) + extra.count()
    got = sorted(r.conv_id for r in t.scan().collect())
    want = sorted(r.conv_id for r in df.unionByName(extra).collect())
    assert got == want


def test_publish_preserves_interleaved_appends(spark, base_table):
    t, df = base_table
    extra = df.limit(40).withColumn("tool", F.lit("staged-tool"))
    staged = t.stage_append(extra, n_files=1)
    # another writer lands a normal append between stage and publish
    mid = df.limit(25).withColumn("tool", F.lit("mid-tool"))
    t.append(mid, n_files=1)
    t.publish_snapshot(staged.snapshot_id)
    n = t.scan().count()
    assert n == df.count() + 40 + 25
    tools = {r.tool for r in t.scan().select("tool").distinct().collect()}
    assert {"staged-tool", "mid-tool"} <= tools


def test_publish_guards(spark, base_table):
    t, df = base_table
    staged = t.stage_append(df.limit(10), n_files=1)
    t.publish_snapshot(staged.snapshot_id)
    with pytest.raises(ValueError, match="already published"):
        t.publish_snapshot(staged.snapshot_id)
    with pytest.raises(ValueError, match="not a staged append"):
        t.publish_snapshot(t.current_snapshot().snapshot_id)


def test_change_feed_reports_rows_at_publish(spark, base_table):
    t, df = base_table
    pre = t.current_snapshot().snapshot_id
    staged = t.stage_append(df.limit(15), n_files=1)
    # feed up to now: staged rows not visible -> no changes
    assert change_feed(t, pre).count() == 0
    pub = t.publish_snapshot(staged.snapshot_id)
    feed = change_feed(t, pre)
    assert feed.count() == 15
    assert {r["_commit_snapshot_id"] for r in feed.collect()} == {pub.snapshot_id}


def test_time_travel_never_surfaces_staged(spark, base_table):
    t, df = base_table
    staged = t.stage_append(df.limit(10), n_files=1)
    # as-of the staged snapshot's own commit time resolves to the PARENT state
    s = t.snapshot_as_of(staged.timestamp_ms)
    assert s.operation != "staged-append"
    assert s.snapshot_id == t.current_snapshot().snapshot_id


def test_expire_protects_retained_staged_files(spark, base_table):
    t, df = base_table
    staged = t.stage_append(df.limit(20), n_files=1)
    staged_paths = {
        f.path for f in t.live_data_files(staged.snapshot_id)
    } - {f.path for f in t.live_data_files()}
    assert staged_paths
    ExpireSnapshotsJob(t, keep_last=3, grace_period_sec=0.0).run()
    for p in staged_paths:
        assert os.path.exists(p)
    # still publishable after the expire pass
    t.publish_snapshot(staged.snapshot_id)
    assert t.scan().count() == df.count() + 20
