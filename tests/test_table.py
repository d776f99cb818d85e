"""Table format end-to-end: create → append → scan (+ pruning, schema evolution,
snapshot isolation). SURVEY.md §7 step 3 — the minimum end-to-end slice."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


def transcripts_schema():
    return T.StructType.fromDDL(SCHEMA_DDL)


def default_spec():
    return PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 4))


@pytest.fixture()
def small_df(spark):
    return generate_transcripts(spark, n_convs=40, hot_convs=1, hot_turns=60).cache()


def sorted_rows(df):
    return [tuple(r) for r in df.orderBy("conv_id", "turn_idx").collect()]


def test_create_append_scan_roundtrip(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df)
    got = sorted_rows(t.scan())
    want = sorted_rows(small_df)
    assert got == want  # per-turn text equality under stable ordering
    d = t.describe()
    assert d["record_count"] == len(want)
    assert d["snapshot_count"] == 1


def test_scan_with_predicates_and_pruning(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df, n_files=3)
    conv = small_df.select("conv_id").orderBy("conv_id").first()[0]
    preds = [("conv_id", "=", conv)]
    planned = t.plan_scan(preds)
    all_files = t.live_data_files()
    assert 0 < len(planned) < len(all_files)  # min/max stats actually prune
    got = sorted_rows(t.scan(preds))
    want = sorted_rows(small_df.filter(F.col("conv_id") == conv))
    assert got == want


def test_date_partition_pruning(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df)
    lo, hi = small_df.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    preds = [("ts", ">=", mid)]
    planned = t.plan_scan(preds)
    assert len(planned) < len(t.live_data_files())
    got = t.scan(preds).count()
    want = small_df.filter(F.col("ts") >= F.lit(mid)).count()
    assert got == want


def test_multiple_appends_accumulate(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df)
    t.append(small_df)
    assert t.scan().count() == 2 * small_df.count()
    assert len(t.snapshots) == 2
    assert t.snapshots[1].parent_snapshot_id == t.snapshots[0].snapshot_id


def test_snapshot_isolation_reader_pinned(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    s1 = t.append(small_df)
    n1 = t.scan().count()
    t.append(small_df)
    # reader pinned at s1 still sees the old file set
    assert t.scan(snapshot_id=s1.snapshot_id).count() == n1
    assert t.scan().count() == 2 * n1


def test_schema_evolution_merge(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df)
    evolved = small_df.withColumn("model", F.lit("m-1"))
    t.append(evolved)  # mergeSchema analogue (delta sinks :122)
    assert "model" in [f.name for f in t.schema.fields]
    df = t.scan()
    assert df.filter(F.col("model").isNull()).count() == small_df.count()
    assert df.filter(F.col("model") == "m-1").count() == small_df.count()
    # missing-column append still works after evolution
    t.append(small_df)
    assert t.scan().filter(F.col("model").isNull()).count() == 2 * small_df.count()


def test_schema_evolution_rejects_incompatible(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df)
    bad = small_df.withColumn("turn_idx", F.col("turn_idx").cast("string"))
    with pytest.raises(ValueError, match="incompatible type"):
        t.append(bad)


def test_unpartitioned_table(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema())
    t.append(small_df, n_files=2)
    assert t.scan().count() == small_df.count()
    assert len(t.live_data_files()) == 2


def test_empty_scan(spark, tmp_table_dir):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    assert t.scan().count() == 0
    assert t.scan().schema == transcripts_schema()


def test_concurrent_append_optimistic_retry(spark, tmp_table_dir, small_df):
    t1 = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t2 = Table.load(spark, tmp_table_dir)
    t1.append(small_df)
    t2.append(small_df)  # stale handle: must rebase, not clobber
    t1.refresh()
    assert len(t1.snapshots) == 2
    assert t1.scan().count() == 2 * small_df.count()


def test_ddl_cluster_keys_and_properties(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df)
    t.set_cluster_keys(["conv_id", "ts"])  # ALTER TABLE ... CLUSTER BY analogue
    t2 = Table.load(spark, tmp_table_dir)
    assert t2.meta.cluster_keys == ["conv_id", "ts"]
    t2.set_property("commit.retention-snapshots", "5")
    assert Table.load(spark, tmp_table_dir).meta.properties[
        "commit.retention-snapshots"] == "5"
    with pytest.raises(ValueError):
        t.set_cluster_keys(["nope"])
    # snapshots survive DDL-only metadata versions
    assert t2.refresh().scan().count() == small_df.count()


def test_distinct_census_approx_within_rsd(spark):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import distinct_census

    df = spark.range(20_000).selectExpr(
        "CAST(id % 1000 AS STRING) AS conv_id", "CAST(id % 37 AS INT) AS turn_idx")
    exact = distinct_census(df, ["conv_id", "turn_idx"], approximate=False).first()
    approx = distinct_census(df, ["conv_id", "turn_idx"], rsd=0.02).first()
    assert exact["n_conv_id"] == 1000 and exact["n_turn_idx"] == 37
    assert abs(approx["n_conv_id"] - 1000) <= 1000 * 0.10
    assert abs(approx["n_turn_idx"] - 37) <= 5
    assert approx["n_rows"] == 20_000


def test_bucket_partition_pruning_point_lookup(spark, tmp_table_dir):
    """conv_id = X prunes (n-1)/n bucket partitions driver-side: the Python
    xxhash64 replica makes bucket values computable without a scan."""
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec, bucket,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.plans.pruning import prune_files
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        SCHEMA_DDL, generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=40, hot_convs=0, span_days=2)
    t = Table.create(spark, tmp_table_dir, T.StructType.fromDDL(SCHEMA_DDL),
                     PartitionSpec.of(bucket("conv_bucket", "conv_id", 4)))
    t.append(df, n_files=8)
    files = t.live_data_files()
    buckets_all = {f.partition["conv_bucket"] for f in files}
    assert len(buckets_all) == 4
    conv = df.select("conv_id").first()["conv_id"]
    kept = prune_files(files, [("conv_id", "=", conv)], t.schema, t.spec)
    assert {f.partition["conv_bucket"] for f in kept} == {
        k for k in buckets_all
        if any(f.partition["conv_bucket"] == k for f in kept)
    }
    assert len({f.partition["conv_bucket"] for f in kept}) == 1  # 3/4 pruned
    # and the scan over pruned files still finds every row of that conv
    got = t.scan([("conv_id", "=", conv)]).count()
    want = df.filter(f"conv_id = '{conv}'").count()
    assert got == want > 0


def test_time_travel_by_timestamp(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    s1 = t.append(small_df)
    n1 = t.scan().count()
    s2 = t.append(small_df)
    # commit timestamps are a strict total order even within one wall-clock ms
    assert s2.timestamp_ms > s1.timestamp_ms
    assert t.snapshot_as_of(s1.timestamp_ms).snapshot_id == s1.snapshot_id
    assert t.snapshot_as_of(s2.timestamp_ms).snapshot_id == s2.snapshot_id
    assert t.snapshot_as_of(s2.timestamp_ms - 1).snapshot_id == s1.snapshot_id
    assert t.scan(as_of_timestamp_ms=s1.timestamp_ms).count() == n1
    with pytest.raises(ValueError):
        t.snapshot_as_of(s1.timestamp_ms - 1)  # before the first commit
    with pytest.raises(ValueError):
        t.scan(snapshot_id=s1.snapshot_id, as_of_timestamp_ms=s1.timestamp_ms)


def test_changes_between_appends(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    first = small_df.filter(F.col("turn_idx") % 2 == 0)
    second = small_df.filter(F.col("turn_idx") % 2 == 1)
    s1 = t.append(first)
    s2 = t.append(second)
    got = sorted_rows(t.changes_between(s1.snapshot_id))
    assert got == sorted_rows(second)
    # full history from table creation
    assert t.changes_between(None).count() == small_df.count()
    # empty range
    assert t.changes_between(s2.snapshot_id).count() == 0


def test_changes_between_rejects_rewrites(spark, tmp_table_dir, small_df):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob

    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    s1 = t.append(small_df, n_files=3)
    CompactionJob(t, max_concurrency=2).run()
    t.append(small_df)
    with pytest.raises(ValueError, match="non-append"):
        t.changes_between(s1.snapshot_id)


def test_restore_rolls_back_live_set(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    s1 = t.append(small_df)
    want = sorted_rows(t.scan())
    t.append(small_df.withColumn("text", F.lit("bad batch")))
    r = t.restore(s1.snapshot_id)
    assert r.operation == "restore"
    assert sorted_rows(t.scan()) == want
    # history preserved: the bad append is still readable by snapshot id
    assert len(t.snapshots) == 3
    assert t.scan(snapshot_id=t.snapshots[1].snapshot_id).count() == 2 * len(want)
    # restore is a live-set change, so the append-only change feed refuses it
    with pytest.raises(ValueError, match="non-append"):
        t.changes_between(s1.snapshot_id)
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.restore(9999)


def test_restore_then_expire_keeps_restored_files(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    s1 = t.append(small_df)
    want = sorted_rows(t.scan())
    t.append(small_df.withColumn("text", F.lit("bad batch")))
    t.restore(s1.snapshot_id)
    expired_ids, dead = t.expire_snapshots(keep_last=1)
    assert expired_ids  # the bad append (and originals) fell out of history
    # restored snapshot still scans intact; its files are not GC candidates
    assert sorted_rows(t.scan()) == want
    live = {f.path for f in t.live_data_files()}
    assert not (live & set(dead))


def test_partition_spec_evolution(spark, tmp_table_dir, small_df):
    t = Table.create(
        spark, tmp_table_dir, transcripts_schema(),
        PartitionSpec.of(days("ts_day", "ts")),
    )
    first = small_df.filter(F.col("turn_idx") % 2 == 0)
    second = small_df.filter(F.col("turn_idx") % 2 == 1)
    t.append(first, n_files=2)
    old_files = {f.path for f in t.live_data_files()}
    t.set_partition_spec(
        PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 4))
    )
    t.append(second, n_files=2)
    # old files untouched; new files carry the new spec's partition values
    assert old_files <= {f.path for f in t.live_data_files()}
    new_files = [f for f in t.live_data_files() if f.path not in old_files]
    assert all("conv_bucket" in f.partition for f in new_files)
    assert all("conv_bucket" not in f.partition for f in t.live_data_files()
               if f.path in old_files)
    # full scan sees both generations
    assert sorted_rows(t.scan()) == sorted_rows(small_df)
    # point lookup: correct rows; bucket pruning applies to new files only,
    # old files survive conservatively (min/max may still skip them)
    conv = small_df.select("conv_id").orderBy("conv_id").first()[0]
    got = sorted_rows(t.scan([("conv_id", "=", conv)]))
    assert got == sorted_rows(small_df.filter(F.col("conv_id") == conv))


def test_partition_evolution_rewrite_migrates_layout(spark, tmp_table_dir, small_df):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob

    t = Table.create(
        spark, tmp_table_dir, transcripts_schema(),
        PartitionSpec.of(days("ts_day", "ts")),
    )
    t.append(small_df, n_files=3)
    t.set_partition_spec(
        PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 4))
    )
    CompactionJob(t, max_concurrency=2).run()
    # compaction rewrote into the CURRENT spec: every live file is migrated
    assert all("conv_bucket" in f.partition for f in t.live_data_files())
    assert sorted_rows(t.scan()) == sorted_rows(small_df)


def test_partition_field_name_reuse_rejected(spark, tmp_table_dir, small_df):
    t = Table.create(
        spark, tmp_table_dir, transcripts_schema(),
        PartitionSpec.of(bucket("conv_bucket", "conv_id", 4)),
    )
    t.append(small_df)
    # same name, different transform param -> stored values incomparable
    with pytest.raises(ValueError, match="incomparable"):
        t.set_partition_spec(PartitionSpec.of(bucket("conv_bucket", "conv_id", 8)))
    # retire the name, then try to re-add it differently: still rejected
    t.set_partition_spec(PartitionSpec.of(days("ts_day", "ts")))
    with pytest.raises(ValueError, match="incomparable"):
        t.set_partition_spec(PartitionSpec.of(bucket("conv_bucket", "conv_id", 8)))
    # identical definition may return
    t.set_partition_spec(PartitionSpec.of(bucket("conv_bucket", "conv_id", 4)))
    with pytest.raises(ValueError, match="unknown source"):
        t.set_partition_spec(PartitionSpec.of(days("d", "nope")))


def test_optimized_write_sizes_files_automatically(spark, tmp_path):
    """write.optimize-write.enabled: append without n_files picks the output
    file count from Catalyst's size estimate / target file size instead of
    one-file-per-input-task (optimizeWrite analogue, utils.py:86)."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import generate_transcripts

    df = generate_transcripts(spark, n_convs=80, hot_convs=1, hot_turns=60, span_days=1)
    # many-task input: without optimize-write this writes one file per task
    df = df.repartition(24)
    t = Table.create(
        spark, str(tmp_path / "ow"),
        T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(),
        properties={
            "write.target-file-size-bytes": str(64 * 1024 * 1024),
            "write.optimize-write.enabled": "true",
        },
    )
    t.append(df)
    files = t.live_data_files()
    # the whole table is << 64 MiB, so the auto-sizer must coalesce to ~1 file
    assert len(files) <= 2
    assert t.scan().count() == df.count()


def test_rewrite_of_replaced_files_conflicts(spark, tmp_table_dir, small_df):
    """Two maintenance jobs racing over the same input files: the loser's
    copy-on-write commit must fail with CommitConflict (its inputs are no
    longer live), never silently resurrect or double-count rows."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import CommitConflict
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob

    t = Table.create(
        spark, tmp_table_dir, transcripts_schema(), default_spec(),
        properties={"write.target-file-size-bytes": str(256 * 1024)},
    )
    t.append(small_df, n_files=2)
    t.append(small_df, n_files=2)
    stale_inputs = [f.path for f in t.live_data_files()]
    CompactionJob(t).run()  # winner rewrites those files away
    with pytest.raises(CommitConflict, match="no longer live"):
        t.commit_rewrite(stale_inputs[:1], [], operation="delete")
    t.refresh()
    assert t.scan().count() == 2 * small_df.count()


def test_append_racing_compaction_rebases(spark, tmp_table_dir, small_df):
    """A stale-handle append lands AFTER a compaction replaced the snapshot it
    was built on: the optimistic commit rebases onto the compacted file set."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob

    t1 = Table.create(
        spark, tmp_table_dir, transcripts_schema(), default_spec(),
        properties={"write.target-file-size-bytes": str(256 * 1024)},
    )
    t1.append(small_df, n_files=2)
    t1.append(small_df, n_files=2)
    t2 = Table.load(spark, tmp_table_dir)  # stale handle
    CompactionJob(t1).run()
    compacted = {f.path for f in t1.refresh().live_data_files()}
    t2.append(small_df, n_files=1)
    t1.refresh()
    assert t1.scan().count() == 3 * small_df.count()
    assert compacted <= {f.path for f in t1.live_data_files()}


def test_threaded_concurrent_appends_all_commit(spark, tmp_table_dir, small_df):
    """N writer handles appending simultaneously (the reference's 15-flow
    fan-in, `gold_ocsf_iam_event_classes_delta_sinks.py:184-305`): optimistic
    retry serializes the commits; every row lands exactly once."""
    from concurrent.futures import ThreadPoolExecutor

    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df)
    handles = [Table.load(spark, tmp_table_dir) for _ in range(4)]
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(lambda h: h.append(small_df, n_files=1), handles))
    t.refresh()
    assert t.scan().count() == 5 * small_df.count()
    assert len(t.snapshots) == 5


def test_merge_schema_widens_numeric_types(spark, tmp_table_dir):
    from pyspark.sql import functions as F

    df = generate_transcripts(spark, n_convs=10, span_days=2)
    t = Table.create(
        spark, tmp_table_dir, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts"))
    )
    t.append(df, n_files=1)
    assert t.schema["turn_idx"].dataType.simpleString() == "int"

    wide = df.withColumn("turn_idx", F.col("turn_idx").cast("long"))
    t.append(wide, n_files=1)
    # the TABLE column widened; old int32 files still read under the new schema
    assert t.schema["turn_idx"].dataType.simpleString() == "bigint"
    assert t.scan().count() == 2 * df.count()
    assert t.scan().schema["turn_idx"].dataType.simpleString() == "bigint"
    # pruning on the widened column still plans correctly
    got = t.scan(predicates=[("turn_idx", "=", 0)]).count()
    want = 2 * df.filter(F.col("turn_idx") == 0).count()
    assert got == want
    # merge_schema=False still rejects the widening
    import pytest as _pytest
    t2 = Table.create(
        spark, tmp_table_dir + "2", T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts"))
    )
    t2.append(df, n_files=1)
    with _pytest.raises(ValueError, match="incompatible type"):
        t2.append(wide, n_files=1, merge_schema=False)


def test_footer_harvest_matches_scan_harvest(spark, tmp_path):
    """The parquet-footer stats fast path must produce the SAME manifest
    entries as the one-scan fallback — bounds (incl. string truncation and
    timestamp encoding), null counts, row counts, partition tuples, and the
    derived xxh64 hash bounds — or pruning behavior would depend on which
    path harvested a file."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import (
        _harvest_from_footers, _merge_hash_bounds,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec, days,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=30, hot_convs=1, hot_turns=40,
                              span_days=3, seed=23)
    spec = PartitionSpec.of(days("ts_day", "ts"))
    out = str(tmp_path / "stage")
    (spec.with_partition_columns(df).write.mode("error")
     .partitionBy(*spec.column_names).parquet(out))

    schema = df.schema
    pcols = [f.name for f in spec.fields]
    stat_cols = ["conv_id", "turn_idx", "role", "tool", "ts"]
    via_footer = _harvest_from_footers([out], schema, pcols, stat_cols)
    assert via_footer is not None and via_footer
    _merge_hash_bounds(spark, [out], via_footer, ["conv_id"])

    # run the one-scan fallback directly for comparison
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import (
        harvest_df_stats,
    )
    from pyspark.sql import functions as F
    raw = spark.read.parquet(out).select(
        "*",
        F.col("_metadata.file_path").alias("_meta_file_path"),
        F.col("_metadata.file_size").alias("_meta_file_size"),
    )
    via_scan = harvest_df_stats(raw, schema, pcols, ["conv_id"], stat_cols)

    assert len(via_footer) == len(via_scan)
    for a, b in zip(via_footer, via_scan):
        assert a.path == b.path
        assert a.partition == b.partition
        assert a.record_count == b.record_count
        assert a.file_size_bytes == b.file_size_bytes
        assert a.lower_bounds == b.lower_bounds, a.path
        assert a.upper_bounds == b.upper_bounds, a.path
        assert a.null_counts == b.null_counts


def test_footer_harvest_adversarial_values(spark, tmp_path):
    """Footer bounds must stay VALID bounds (and match the scan harvest) on
    hostile inputs: unicode past the truncation width, empty strings,
    all-null columns, NaN doubles, negative ints, sub-second timestamps."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import (
        _harvest_from_footers, harvest_df_stats,
    )

    schema = T.StructType.fromDDL(
        "s string, i int, d double, ts timestamp_ntz, dead string")
    rows = [
        ("", -5, float("nan"), None, None),
        ("z" * 100 + "é世界", 2147483647, -1.5,
         __import__("datetime").datetime(2024, 3, 1, 12, 0, 0, 123456), None),
        ("é" * 40, -2147483648, 0.0,
         __import__("datetime").datetime(1999, 12, 31, 23, 59, 59), None),
        (None, 0, 1e300, None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "adv")
    df.coalesce(1).write.parquet(out)

    stat_fields = list(schema.fields)
    via_footer = _harvest_from_footers([out], schema, [], None)
    assert via_footer is not None and len(via_footer) == 1
    raw = spark.read.parquet(out).select(
        "*",
        F.col("_metadata.file_path").alias("_meta_file_path"),
        F.col("_metadata.file_size").alias("_meta_file_size"),
    )
    via_scan = harvest_df_stats(raw, schema, [])
    a, b = via_footer[0], via_scan[0]
    assert a.record_count == b.record_count == 4
    assert a.null_counts == b.null_counts
    # doubles with NaN: both paths must agree (whatever each engine layer
    # does with NaN, pruning must see the same picture)
    assert a.lower_bounds == b.lower_bounds
    assert a.upper_bounds == b.upper_bounds
    # and the recorded bounds really bound the data (validity, not just parity)
    import json
    if "s" in a.lower_bounds:
        lo = json.loads(a.lower_bounds["s"])
        hi = json.loads(a.upper_bounds["s"])
        for s, *_ in rows:
            if s is not None:
                assert lo <= s <= hi or s.startswith(hi[:-1])
                assert lo <= s
                assert s <= hi or hi >= s[:len(hi)]
