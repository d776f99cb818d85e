"""Sample-free range routing (functions/ranging.py): Murmur3 parity with
Spark, exact bucket->reducer placement, and layout equivalence with the
sampled range exchange it replaces."""

import pytest
from pyspark.sql import functions as F

from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions.ranging import (
    bucket_search_tree,
    inverse_hash_labels,
    murmur3_int32,
    route_by_key_ranges,
    slice_grid,
)


def test_murmur3_matches_spark_hash(spark):
    """The Python Murmur3_x86_32 must be bit-identical to F.hash(int) —
    the whole routing scheme rides on this."""
    vals = list(range(0, 200)) + [2**31 - 1, -1, -2**31, 12345678]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = {r["v"]: r["h"] for r in df.select("v", F.hash("v").alias("h")).collect()}
    for v in vals:
        assert murmur3_int32(v) == got[v], v


def test_inverse_hash_labels_route_identity():
    for n in (1, 2, 7, 40, 64, 173):
        labels = inverse_hash_labels(n)
        assert len(set(labels)) == n
        for i, l in enumerate(labels):
            assert murmur3_int32(l) % n == i


def test_slice_grid():
    grid = list(range(1, 128))  # 127 fine quantiles
    cuts = slice_grid(grid, 4)
    assert len(cuts) == 3
    assert cuts == sorted(cuts)
    assert slice_grid(grid, 1) == []
    assert slice_grid([], 5) == []
    # heavy duplicates collapse instead of making out-of-order cuts
    assert slice_grid([7] * 127, 4) == [7]


def test_bucket_search_tree(spark):
    bounds = [10, 20, 30]
    df = spark.range(0, 45).select(F.col("id").alias("k"))
    out = df.select("k", bucket_search_tree(F.col("k"), bounds, base=5).alias("b"))
    for r in out.collect():
        want = 5 + sum(1 for b in bounds if r["k"] > b)
        assert r["b"] == want, (r["k"], r["b"], want)


def test_route_places_each_bucket_in_own_reducer(spark):
    df = (
        spark.range(0, 20000)
        .select(
            (F.col("id") % 3).cast("string").alias("p"),
            F.xxhash64(F.col("id").cast("string")).alias("key"),
        )
    )
    routed, n = route_by_key_ranges(df, ["p"], "key", 12)
    assert n >= 3
    pairs = (
        routed.select(F.spark_partition_id().alias("pid"), "_range_label")
        .distinct()
        .collect()
    )
    # one label per reducer and vice versa: exact identity routing
    pids = [r["pid"] for r in pairs]
    labels = [r["_range_label"] for r in pairs]
    assert len(pids) == len(set(pids))
    assert len(labels) == len(set(labels))
    # buckets never straddle table partitions
    by_reducer = (
        routed.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.countDistinct("p").alias("nparts"), F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    assert all(r["nparts"] == 1 for r in by_reducer)
    # row balance: no reducer more than 2.5x the mean
    rows = [r["rows"] for r in by_reducer]
    assert max(rows) <= 2.5 * (sum(rows) / len(rows))


def test_route_key_ranges_disjoint_within_partition(spark):
    """Each reducer holds one contiguous key range of one partition — the
    property that makes post-write file bounds tight for pruning."""
    df = (
        spark.range(0, 30000)
        .select(
            (F.col("id") % 2).cast("string").alias("p"),
            F.xxhash64(F.col("id").cast("string")).alias("key"),
        )
    )
    routed, _ = route_by_key_ranges(df, ["p"], "key", 10)
    spans = (
        routed.groupBy(F.spark_partition_id().alias("pid"), "p")
        .agg(F.min("key").alias("lo"), F.max("key").alias("hi"))
        .collect()
    )
    by_p = {}
    for r in spans:
        by_p.setdefault(r["p"], []).append((r["lo"], r["hi"]))
    for p, ranges in by_p.items():
        ranges.sort()
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 < l2, (p, ranges)  # keys are unique xxhash64: strict


def test_clustering_layout_equivalent_with_and_without_sampling(
    spark, tmp_path, monkeypatch
):
    """End-to-end: the sample-free router and legacy repartitionByRange give
    the same scan results and comparably tight per-file pruning."""
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import (
        ClusteringJob,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        SCHEMA_DDL, generate_transcripts,
    )

    src = generate_transcripts(spark, n_convs=300, hot_convs=2, hot_turns=300,
                               span_days=20)
    schema = T.StructType.fromDDL(SCHEMA_DDL)
    props = {"write.target-file-size-bytes": str(64 * 1024)}

    t1 = Table.create(spark, str(tmp_path / "a"), schema,
                      PartitionSpec.unpartitioned(), properties=props)
    t1.append(src.repartition(8, "text"))
    monkeypatch.setenv("SPARK_GRAFT_RANGE_SAMPLE", "1")
    ClusteringJob(t1, curve="zorder").run()
    monkeypatch.delenv("SPARK_GRAFT_RANGE_SAMPLE")

    t2 = Table.create(spark, str(tmp_path / "b"), schema,
                      PartitionSpec.unpartitioned(),
                      properties={**props,
                                  "write.cluster.range-router": "always"})
    t2.append(src.repartition(8, "text"))
    ClusteringJob(t2, curve="zorder").run()

    rows1 = [tuple(r) for r in t1.scan().orderBy("conv_id", "turn_idx").collect()]
    rows2 = [tuple(r) for r in t2.scan().orderBy("conv_id", "turn_idx").collect()]
    assert rows1 == rows2

    conv = src.select("conv_id").distinct().limit(1).collect()[0][0]
    pred = [("conv_id", "=", conv)]
    frac1 = len(t1.plan_scan(pred)) / max(1, len(t1.live_data_files()))
    frac2 = len(t2.plan_scan(pred)) / max(1, len(t2.live_data_files()))
    # the router's pruning power matches the sampled exchange (+ slack for
    # sketch-vs-sample boundary jitter)
    assert frac2 <= frac1 + 0.25


def test_router_on_partitioned_table(spark, tmp_path):
    """Partitioned table through the router: scan equivalence, per-file key
    bounds stay partition-pure (buckets never straddle partitions)."""
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec, bucket, days,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import (
        ClusteringJob,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        SCHEMA_DDL, generate_transcripts,
    )

    src = generate_transcripts(spark, n_convs=200, hot_convs=2, hot_turns=200,
                               span_days=6)
    schema = T.StructType.fromDDL(SCHEMA_DDL)
    t = Table.create(
        spark, str(tmp_path / "p"), schema,
        PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 2)),
        properties={"write.target-file-size-bytes": str(64 * 1024),
                    "write.cluster.range-router": "always"},
    )
    t.append(src.repartition(6, "text"))
    before = [tuple(r) for r in t.scan().orderBy("conv_id", "turn_idx").collect()]
    res = ClusteringJob(t, curve="zorder").run()
    assert res.files_out >= 1
    after = [tuple(r) for r in t.scan().orderBy("conv_id", "turn_idx").collect()]
    assert after == before
    # every output file belongs to exactly one partition (dirs enforce it),
    # and files within a partition have non-overlapping turn_idx+ts z-ranges
    # is implied by tight bounds; sanity: pruning a single day skips files
    day = sorted({f.partition["ts_day"] for f in t.live_data_files()})[0]
    hit = [f for f in t.live_data_files() if f.partition["ts_day"] == day]
    assert 0 < len(hit) < len(t.live_data_files())
