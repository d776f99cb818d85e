"""Compaction: FFD packer properties, scan-equivalence, snapshot isolation, resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import (
    CompactionJob, ffd_pack, plan_compaction,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.ledger import Ledger
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


# ------------------------------------------------------------- FFD unit

def test_ffd_respects_capacity():
    items = [(f"f{i}", s) for i, s in enumerate([70, 50, 40, 30, 20, 10, 5])]
    bins = ffd_pack(items, 100)
    sizes = dict(items)
    for b in bins:
        assert sum(sizes[i] for i in b) <= 100
    assert sorted(i for b in bins for i in b) == sorted(sizes)


def test_ffd_oversized_items_get_own_bin():
    bins = ffd_pack([("big", 500), ("a", 10), ("b", 20)], 100)
    assert ["big"] in bins


def test_ffd_is_deterministic_and_reasonably_tight():
    items = [(f"f{i}", (i * 37) % 90 + 10) for i in range(50)]
    b1, b2 = ffd_pack(items, 128), ffd_pack(items, 128)
    assert b1 == b2
    total = sum(s for _, s in items)
    assert len(b1) <= (total // 128) * 2 + 2  # FFD is within 2x of optimal (loose)


# ------------------------------------------------------- end-to-end job

def schema():
    return T.StructType.fromDDL(SCHEMA_DDL)


def spec():
    return PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 2))


@pytest.fixture()
def fragmented_table(spark, tmp_table_dir):
    """Table with many small files per partition (FIXTURES.md: compaction has real work)."""
    df = generate_transcripts(spark, n_convs=60, hot_convs=1, hot_turns=100, span_days=5)
    t = Table.create(
        spark, tmp_table_dir, schema(), spec(),
        properties={"write.target-file-size-bytes": str(4 * 1024 * 1024)},
    )
    for _ in range(3):  # 3 appends x n_files=4 -> lots of small files per partition
        t.append(df, n_files=4)
    return t, df


def sorted_rows(df):
    return [tuple(r) for r in df.orderBy("conv_id", "turn_idx", "ts").collect()]


def test_compaction_scan_equivalence(spark, fragmented_table):
    t, _src = fragmented_table
    before = sorted_rows(t.scan())
    n_files_before = len(t.live_data_files())
    res = CompactionJob(t, max_concurrency=4).run()
    n_files_after = len(t.live_data_files())
    assert n_files_after < n_files_before
    assert res.files_in > res.files_out
    after = sorted_rows(t.scan())
    assert after == before  # per-turn text equality under stable ordering
    assert res.rows == len(after)


def test_compaction_preserves_partition_membership(spark, fragmented_table):
    t, _ = fragmented_table
    CompactionJob(t, max_concurrency=2).run()
    # every output file's recorded partition matches its actual content bounds
    for f in t.live_data_files():
        df = spark.read.schema(t.schema).parquet(f.path)
        derived = spec().with_partition_columns(df).select("_p_ts_day", "_p_conv_bucket").distinct().collect()
        assert len(derived) == 1
        assert derived[0][0] == f.partition["ts_day"]
        assert derived[0][1] == f.partition["conv_bucket"]


def test_compaction_snapshot_isolation(spark, fragmented_table):
    t, _ = fragmented_table
    pre = t.current_snapshot().snapshot_id
    pre_count = t.scan(snapshot_id=pre).count()
    CompactionJob(t).run()
    assert t.scan(snapshot_id=pre).count() == pre_count  # pinned reader unaffected
    assert t.current_snapshot().operation == "replace"


def test_compaction_ledger_lineage_partitions_inputs(spark, fragmented_table):
    t, _ = fragmented_table
    snap_before = t.current_snapshot().snapshot_id
    inputs_before = {f.path for f in t.live_data_files()}
    CompactionJob(t).run()
    ledger = Ledger(t.location, f"compact-{snap_before}", "compact")
    recs = [r for r in ledger.records() if r.get("state") == "committed"]
    all_inputs = [p for r in recs for p in r["input_files"]]
    assert len(all_inputs) == len(set(all_inputs))  # disjoint
    assert set(all_inputs) <= inputs_before
    assert ledger.job_done()


def test_compaction_resume_skips_completed_partitions(spark, fragmented_table, monkeypatch):
    t, _ = fragmented_table
    job = CompactionJob(t, max_concurrency=1)
    plans = plan_compaction(
        t, target_file_size=job.target_file_size,
        small_file_ratio=job.small_file_ratio, min_input_files=job.min_input_files,
    )
    assert len(plans) >= 2
    # simulate a crash after partition 0's rewrite hit disk but before the
    # batched stats harvest ran (the `written` ledger state)
    snap_id = t.current_snapshot().snapshot_id
    ledger = Ledger(t.location, f"compact-{snap_id}", "compact")
    out_dir = job._rewrite_partition(plans[0], f"compact-{snap_id}")
    ledger.record_partition_written(
        plans[0].partition, [f.path for f in plans[0].input_files], out_dir,
    )
    before = sorted_rows(t.scan())
    res = CompactionJob(t, max_concurrency=1).run(resume=True)
    assert res.skipped_resume == 1  # partition 0's rewrite reused, not redone
    assert sorted_rows(t.scan()) == before
    # and a second resume reuses fully-committed records (zero I/O path)
    recs = Ledger(t.location, f"compact-{snap_id}", "compact").completed_partitions()
    assert len(recs) == len(plans)


def test_compaction_idempotent_noop_after_run(spark, fragmented_table):
    t, _ = fragmented_table
    CompactionJob(t).run()
    files_after = {f.path for f in t.live_data_files()}
    res2 = CompactionJob(t).run()
    assert res2.partitions == 0 or res2.files_in == 0
    assert {f.path for f in t.live_data_files()} == files_after


def test_auto_compact_on_append(spark, tmp_table_dir):
    """write.auto-compact.enabled: appends past the small-file threshold
    trigger a scoped rewrite right behind the commit (autoCompact analogue,
    reference utilities/utils.py:87), restricted to touched partitions."""
    df = generate_transcripts(spark, n_convs=40, hot_convs=1, hot_turns=50, span_days=2)
    t = Table.create(
        spark, tmp_table_dir, schema(), spec(),
        properties={
            "write.target-file-size-bytes": str(4 * 1024 * 1024),
            "write.auto-compact.enabled": "true",
            "write.auto-compact.min-input-files": "6",
        },
    )
    t.append(df, n_files=4)  # 4 files/partition: below threshold, no work yet
    first = t.last_auto_compact
    assert first.partitions == 0 or first.files_out == 0 or first.files_in == 0
    t.append(df, n_files=4)
    t.append(df, n_files=4)
    res = t.last_auto_compact
    assert res.files_in > res.files_out > 0  # the last append triggered packing
    assert t.current_snapshot().operation == "replace"
    # scan equivalence: three identical appends, nothing lost or duplicated
    assert t.scan().count() == 3 * df.count()
    expected = sorted(
        [tuple(r) for r in df.collect()] * 3,
        key=lambda r: tuple(str(x) for x in r),
    )
    got = sorted(
        [tuple(r) for r in t.scan().collect()],
        key=lambda r: tuple(str(x) for x in r),
    )
    assert got == expected


def test_auto_compact_scopes_to_touched_partitions(spark, tmp_table_dir):
    """Appends to one day never re-plan another day's fragmented history."""
    df = generate_transcripts(spark, n_convs=40, hot_convs=1, hot_turns=50, span_days=2)
    day0 = df.filter(F.dayofmonth("ts") % 2 == 0)
    day1 = df.filter(F.dayofmonth("ts") % 2 == 1)
    t = Table.create(
        spark, tmp_table_dir, schema(), spec(),
        properties={"write.target-file-size-bytes": str(4 * 1024 * 1024)},
    )
    for _ in range(4):
        t.append(day0, n_files=3)  # fragment day0 with auto-compact OFF
    frag_before = {f.path for f in t.live_data_files()}
    t.set_property("write.auto-compact.enabled", "true")
    t.set_property("write.auto-compact.min-input-files", "3")
    for _ in range(3):
        t.append(day1, n_files=3)
    # day1's fragmentation was folded...
    assert t.last_auto_compact.files_out > 0
    # ...but day0's untouched partitions were left alone (cold history)
    still_live = {f.path for f in t.live_data_files()}
    assert frag_before <= still_live


# ------------------------------------------- layout-aware xxh64 harvest

def test_hash_bounds_follow_layout(spark, tmp_table_dir):
    """xxh64 bounds are harvested only where they can prune: curve layouts
    (zorder/hilbert hash the conv dimension) get them; lexicographic appends
    and bin-pack compaction skip the key scan (stats.layout_hash_cols) —
    their per-file hash range is ~full-width and scoping/pruning treat the
    absent bounds conservatively."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import (
        ClusteringJob,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import (
        hash_bound_key,
    )

    df = generate_transcripts(spark, n_convs=40, hot_convs=1, hot_turns=50,
                              span_days=2)
    t = Table.create(
        spark, tmp_table_dir, schema(), PartitionSpec.of(days("ts_day", "ts")),
        properties={"stats.hash-columns": "conv_id",
                    "write.target-file-size-bytes": str(1024 * 1024)},
    )
    for _ in range(3):
        t.append(df, n_files=2, sort_within=("conv_id", "turn_idx"))
    hkey = hash_bound_key("conv_id")
    assert all(hkey not in f.lower_bounds for f in t.live_data_files())

    CompactionJob(t, min_input_files=2).run()
    assert all(hkey not in f.lower_bounds for f in t.live_data_files())
    # string bounds still tight enough to scope merges (conv-sorted bins)
    assert all("conv_id" in f.lower_bounds for f in t.live_data_files())

    ClusteringJob(t, curve="zorder", incremental=False).run()
    clustered = t.live_data_files()
    assert clustered and all(hkey in f.lower_bounds for f in clustered)


def test_hash_bounds_always_property_override(spark, tmp_table_dir):
    """stats.hash-columns.always=true restores the unconditional harvest for
    workloads whose unordered files are near-single-key (tight hash range)."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import (
        hash_bound_key,
    )

    df = generate_transcripts(spark, n_convs=20, hot_convs=1, hot_turns=20,
                              span_days=1)
    t = Table.create(
        spark, tmp_table_dir, schema(), PartitionSpec.of(days("ts_day", "ts")),
        properties={"stats.hash-columns": "conv_id",
                    "stats.hash-columns.always": "true"},
    )
    t.append(df, n_files=2)
    hkey = hash_bound_key("conv_id")
    assert all(hkey in f.lower_bounds for f in t.live_data_files())


def test_layout_hash_cols_unit():
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import (
        layout_hash_cols,
    )

    # lexicographic layouts (no sort spec) skip the scan
    assert layout_hash_cols(["conv_id"], [], {}, None) == []
    # curve layouts keep the hash (leading) dimension only
    assert layout_hash_cols(["conv_id"], [], {},
                            "zorder(conv_id,turn_idx,ts)") == ["conv_id"]
    assert layout_hash_cols(["conv_id", "role"], [], {},
                            "hilbert(conv_id,turn_idx,ts)") == ["conv_id"]
    # blooms already pay for the key scan -> hash bounds ride along free
    assert layout_hash_cols(["conv_id"], ["conv_id"], {}, None) == ["conv_id"]
    # explicit opt-out of the optimization
    assert layout_hash_cols(["conv_id"], [],
                            {"stats.hash-columns.always": "true"},
                            None) == ["conv_id"]
    assert layout_hash_cols([], [], {}, "zorder(conv_id,turn_idx,ts)") == []
