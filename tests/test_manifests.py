"""Manifest rewrite + manifest-level pruning: metadata compaction layer."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format import manifest as mf
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.maintain import run_maintenance
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.manifests import (
    RewriteManifestsJob,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.plans.pruning import (
    prune_manifest_records,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


def schema():
    return T.StructType.fromDDL(SCHEMA_DDL)


def _manifest_count(t: Table) -> int:
    return len(mf.read_manifest_list(t.current_snapshot().manifest_list))


def _make(spark, loc, n_appends=6, span_days=6):
    df = generate_transcripts(
        spark, n_convs=40, hot_convs=1, hot_turns=30, span_days=span_days
    )
    t = Table.create(
        spark, loc, schema(), PartitionSpec.of(days("ts_day", "ts"))
    )
    for _ in range(n_appends):
        t.append(df, n_files=2)
    return t, df


def test_rewrite_coalesces_and_preserves_scan(spark, tmp_table_dir):
    t, df = _make(spark, tmp_table_dir, n_appends=6)
    assert _manifest_count(t) == 6  # one manifest per append commit
    before = sorted(
        (f.path, f.record_count) for f in t.live_data_files()
    )
    pinned = t.current_snapshot().snapshot_id
    rows_before = sorted(t.scan().collect())

    res = RewriteManifestsJob(t).run()
    assert res.snapshot_id is not None
    assert res.manifests_before == 6
    assert res.manifests_after == 1
    # pure metadata: identical live file set, identical rows
    assert sorted((f.path, f.record_count) for f in t.live_data_files()) == before
    assert sorted(t.scan().collect()) == rows_before
    # time travel: the pinned snapshot still resolves its own manifest list
    assert sorted(t.scan(snapshot_id=pinned).collect()) == rows_before
    # all entries carried as EXISTING in the fresh manifest
    recs = mf.read_manifest_list(t.current_snapshot().manifest_list)
    assert recs[0]["existing_files_count"] == len(before)
    assert recs[0]["added_files_count"] == 0


def test_rewrite_noop_when_compact(spark, tmp_table_dir):
    t, _ = _make(spark, tmp_table_dir, n_appends=6)
    assert RewriteManifestsJob(t).run().snapshot_id is not None
    v = t.meta.version
    res = RewriteManifestsJob(t).run()  # second pass: already optimal
    assert res.snapshot_id is None
    assert t.meta.version == v  # no commit written


def test_rewrite_respects_target_entries(spark, tmp_table_dir):
    t, _ = _make(spark, tmp_table_dir, n_appends=5)
    n_files = len(t.live_data_files())
    target = max(1, n_files // 3)
    res = RewriteManifestsJob(t, target_entries=target).run()
    expected = -(-n_files // target)
    assert res.manifests_after == expected
    # partition-sorted packing -> each manifest covers a contiguous day range
    recs = mf.read_manifest_list(t.current_snapshot().manifest_list)
    import json
    ranges = []
    for rec in recs:
        s = json.loads(rec["partition_summaries"]["ts_day"])
        ranges.append((s["lo"], s["hi"]))
    assert all(lo <= hi for lo, hi in ranges)


def test_manifest_level_pruning_skips_day_ranges(spark, tmp_table_dir):
    # one append per day -> per-manifest summaries cover a single day each
    t = Table.create(
        spark, tmp_table_dir, schema(), PartitionSpec.of(days("ts_day", "ts"))
    )
    base = datetime.datetime(2025, 3, 1)
    for d in range(5):
        df = generate_transcripts(spark, n_convs=10, span_days=1).withColumn(
            "ts", F.lit(base + datetime.timedelta(days=d)) + (
                F.col("turn_idx") * F.expr("INTERVAL 1 SECOND"))
        )
        t.append(df, n_files=1)
    recs = mf.read_manifest_list(t.current_snapshot().manifest_list)
    assert len(recs) == 5

    cutoff = base + datetime.timedelta(days=3)
    preds = [("ts", ">=", cutoff)]
    survivors = prune_manifest_records(recs, preds, t.spec)
    assert len(survivors) == 2  # days 3 and 4 only

    # and the full scan path agrees with an unpruned read
    got = sorted(t.scan(predicates=preds).select("conv_id", "turn_idx").collect())
    want = sorted(
        t.scan().filter(F.col("ts") >= F.lit(cutoff))
        .select("conv_id", "turn_idx").collect()
    )
    assert got == want

    # equality prune on the same layer
    eq_preds = [("ts", "=", base + datetime.timedelta(days=1, hours=2))]
    assert len(prune_manifest_records(recs, eq_preds, t.spec)) == 1


def test_maintain_triggers_manifest_rewrite(spark, tmp_table_dir):
    # append-only regime: one well-sized file per day partition, so the
    # compaction stage no-ops and only the manifest layer is fragmented
    t = Table.create(
        spark, tmp_table_dir, schema(), PartitionSpec.of(days("ts_day", "ts"))
    )
    base = datetime.datetime(2025, 3, 1)
    for d in range(6):
        df = generate_transcripts(spark, n_convs=10, span_days=1).withColumn(
            "ts", F.lit(base + datetime.timedelta(days=d)) + (
                F.col("turn_idx") * F.expr("INTERVAL 1 SECOND"))
        )
        t.append(df, n_files=1)
    assert _manifest_count(t) == 6
    t.set_property("maintenance.manifest.max-count", "4")
    t.set_property("maintenance.expire.keep-last", "0")
    rows = sorted(t.scan().collect())
    res = run_maintenance(t)
    assert res.manifests is not None
    assert res.manifests.manifests_after < res.manifests.manifests_before
    assert _manifest_count(t) <= 4
    assert sorted(t.scan().collect()) == rows


def test_rewrite_manifests_sql_statement(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_database("db")
    t = cat.create_table(
        "db.tr", schema(), PartitionSpec.of(days("ts_day", "ts"))
    )
    df = generate_transcripts(spark, n_convs=20, span_days=2)
    for _ in range(4):
        t.append(df, n_files=1)
    res = run_sql(cat, "REWRITE MANIFESTS db.tr")
    assert res.manifests_before == 4 and res.manifests_after == 1


def test_rewrite_rebases_over_concurrent_append(spark, tmp_table_dir):
    t, df = _make(spark, tmp_table_dir, n_appends=4)
    stale = Table.load(spark, tmp_table_dir)
    t.append(df, n_files=1)  # advance the table under the stale handle
    res = RewriteManifestsJob(stale).run()
    assert res.snapshot_id is not None
    fresh = Table.load(spark, tmp_table_dir)
    # the rewrite carried the concurrent append's files
    assert {f.path for f in fresh.live_data_files()} == {
        f.path for f in t.live_data_files()
    }
    assert fresh.scan().count() == t.scan().count()


def test_expire_gcs_stranded_metadata(spark, tmp_table_dir):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.expire import (
        ExpireSnapshotsJob,
    )
    import os

    t, _ = _make(spark, tmp_table_dir, n_appends=5)
    RewriteManifestsJob(t).run()  # strands the 5 per-append manifests
    mdir = os.path.join(t.location, "metadata")

    def avro_files():
        return {n for n in os.listdir(mdir)
                if n.startswith(("manifest-", "snap-")) and n.endswith(".avro")}

    before = avro_files()
    rows = sorted(t.scan().collect())
    res = ExpireSnapshotsJob(t, keep_last=1, grace_period_sec=0.0).run()
    assert res.metadata_files_deleted > 0
    after = avro_files()
    # fewer overall (the expire commit itself adds one fresh manifest list)
    assert len(after) < len(before)
    # every retained snapshot's manifest list + manifests still resolve
    for s in t.meta.snapshots:
        assert os.path.exists(s.manifest_list)
        for rec in mf.read_manifest_list(s.manifest_list):
            assert os.path.exists(rec["path"])
    assert sorted(t.scan().collect()) == rows


def test_metadata_gc_grace_protects_fresh_files(spark, tmp_table_dir):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.expire import (
        gc_metadata_files,
    )
    t, _ = _make(spark, tmp_table_dir, n_appends=4)
    RewriteManifestsJob(t).run()
    # old manifests stay referenced by old snapshots: nothing to GC yet
    assert gc_metadata_files(t, grace_period_sec=0.0) == 0
    t.expire_snapshots(keep_last=1)  # now the per-append manifests strand
    # everything on disk is seconds old: a 1h grace deletes nothing ...
    assert gc_metadata_files(t, grace_period_sec=3600.0) == 0
    # ... but with no grace the stranded metadata goes
    assert gc_metadata_files(t, grace_period_sec=0.0) > 0


def test_write_manifest_stamps_entries_not_inputs(tmp_path):
    """Sequence stamping is pure: re-invoking write_manifest with the SAME
    DataFile objects and a higher sequence (the optimistic-retry shape) must
    produce entries at the new sequence, and never mutate the inputs."""
    f = mf.DataFile(path="x.parquet", partition={"ts_day": "2025-03-01"},
                    record_count=1, file_size_bytes=10)
    p1, p2 = str(tmp_path / "m1.avro"), str(tmp_path / "m2.avro")
    mf.write_manifest(p1, [f], snapshot_id=1, sequence_number=7)
    assert f.data_sequence == 0
    mf.write_manifest(p2, [f], snapshot_id=2, sequence_number=9)
    assert [e["data_sequence"] for e in mf.read_manifest(p1)] == [7]
    assert [e["data_sequence"] for e in mf.read_manifest(p2)] == [9]
    # survivors loaded with a real sequence keep it
    g = mf.DataFile(path="y.parquet", partition={"ts_day": "2025-03-01"},
                    record_count=1, file_size_bytes=10, data_sequence=3)
    mf.write_manifest(p1, [g], snapshot_id=3, status=mf.STATUS_EXISTING,
                      sequence_number=9)
    assert [e["data_sequence"] for e in mf.read_manifest(p1)] == [3]


def test_mixed_spec_era_manifest_summary_is_conservative(tmp_path):
    """A manifest packing pre-partition-evolution files (no value for a
    later-added field) with post-evolution files must NOT publish a summary
    for that field: min/max over only the new files would let
    prune_manifest_records drop the whole manifest and silently lose the old
    files' rows."""
    old = mf.DataFile(path="old.parquet", partition={},
                      record_count=1, file_size_bytes=1)
    new = mf.DataFile(path="new.parquet",
                      partition={"ts_day": "2025-03-05"},
                      record_count=1, file_size_bytes=1)
    rec = mf.write_manifest(str(tmp_path / "m.avro"), [old, new],
                            snapshot_id=3)
    assert "ts_day" not in rec["partition_summaries"]
    spec = PartitionSpec.of(days("ts_day", "ts"))
    preds = [("ts", ">=", datetime.datetime(2025, 3, 20))]
    assert prune_manifest_records([rec], preds, spec) == [rec]
    # a manifest where EVERY file carries the value still summarizes + prunes
    rec2 = mf.write_manifest(str(tmp_path / "m2.avro"), [new], snapshot_id=3)
    assert "ts_day" in rec2["partition_summaries"]
    assert prune_manifest_records([rec2], preds, spec) == []
