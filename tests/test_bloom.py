"""Per-file bloom-filter skipping (format/bloom.py + pruning integration).

The scenario min/max cannot handle: a time-ordered append mixes conv_ids, so
every file's conv_id bounds span the keyspace — only a bloom proves absence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.bloom import (
    BLOOM_K,
    bloom_key,
    bloom_might_contain,
    decode_bloom,
    encode_bloom,
    harvest_blooms,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.manifest import DataFile


def test_encode_decode_roundtrip():
    words = {0: 1, 5: (1 << 63) | 7, 127: -1 & ((1 << 64) - 1)}
    enc = encode_bloom(8192, 4, words)
    m, k, out = decode_bloom(enc)
    assert (m, k) == (8192, 4)
    assert out == words
    # zero words are dropped from the sparse encoding
    assert decode_bloom(encode_bloom(64, 2, {3: 0}))[2] == {}


def test_harvest_rejects_non_power_of_two(spark):
    df = spark.createDataFrame([("f", "v")], "fp string, c string")
    with pytest.raises(ValueError, match="power of two"):
        harvest_blooms(df, "fp", ["c"], m=1000)


def test_no_false_negatives_and_bounded_fpr(spark):
    df = spark.createDataFrame(
        [(f"f{i % 2}", f"conv-{i:05d}") for i in range(2000)],
        "fp string, conv string")
    blooms = harvest_blooms(df, "fp", ["conv"], m=8192)
    enc = blooms["f1"][bloom_key("conv")]
    present = [f"conv-{i:05d}" for i in range(1, 2000, 2)]
    assert all(bloom_might_contain(enc, v) for v in present)
    absent = [f"other-{i}" for i in range(4000)]
    fpr = sum(bloom_might_contain(enc, v) for v in absent) / len(absent)
    assert fpr < 0.10  # theory ~2.4% at n=1000, m=8192, k=4


def test_spark_and_python_positions_agree(spark):
    """The build (Catalyst) and the probe (pure Python) must set/test the
    SAME bits — including unicode, empty string, and long values."""
    vals = ["conv-000123", "", "Ω-unicode-λ", "a" * 300, "\x01\x02"]
    df = spark.createDataFrame([("f", v) for v in vals], "fp string, c string")
    enc = harvest_blooms(df, "fp", ["c"], m=4096)["f"][bloom_key("c")]
    assert all(bloom_might_contain(enc, v) for v in vals)
    m, k, words = decode_bloom(enc)
    n_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words.values())
    assert n_bits <= len(vals) * BLOOM_K  # exactly the k probes per value


def test_null_values_are_skipped(spark):
    df = spark.createDataFrame(
        [("f", "x"), ("f", None)], "fp string, c string")
    blooms = harvest_blooms(df, "fp", ["c"], m=64)
    assert bloom_might_contain(blooms["f"][bloom_key("c")], "x")


def _mk_file(path, blooms=None, lower=None, upper=None):
    return DataFile(path=path, partition={}, record_count=10,
                    file_size_bytes=100, lower_bounds=lower or {},
                    upper_bounds=upper or {}, null_counts={},
                    blooms=blooms or {})


def test_pruner_uses_blooms(spark):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.plans.pruning import (
        prune_files,
    )
    df = spark.createDataFrame(
        [("fA", "conv-a"), ("fB", "conv-b")], "fp string, conv_id string")
    blooms = harvest_blooms(df, "fp", ["conv_id"], m=1024)
    files = [
        _mk_file("fA", {bloom_key("conv_id"): blooms["fA"][bloom_key("conv_id")]}),
        _mk_file("fB", {bloom_key("conv_id"): blooms["fB"][bloom_key("conv_id")]}),
        _mk_file("fC"),  # no bloom -> never bloom-pruned
    ]
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("conv_id", T.StringType())])
    survive = prune_files(files, [("conv_id", "=", "conv-a")], schema, None)
    assert [f.path for f in survive] == ["fA", "fC"]
    survive = prune_files(files, [("conv_id", "in", ["conv-b", "zzz"])],
                          schema, None)
    assert [f.path for f in survive] == ["fB", "fC"]
    # non-string values are never bloom-tested
    survive = prune_files(files, [("conv_id", "=", 7)], schema, None)
    assert len(survive) == 3


def test_table_point_lookup_skips_files(spark, tmp_path):
    """End-to-end: time-ordered appends (wide conv bounds per file) + bloom
    property => a conv_id point lookup plans a strict subset of files, and
    the scan result matches the unpruned scan exactly."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table

    import pyspark.sql.types as T

    loc = str(tmp_path / "t")
    tbl = Table.create(
        spark, loc,
        T.StructType.fromDDL(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"),
        properties={"stats.bloom-columns": "conv_id",
                    "stats.bloom-bits": "4096"},
    )
    # two appends, each holding a disjoint conv population but sorted by ts
    # so conv_id min/max bounds overlap heavily within each append's files
    base = spark.range(0, 1200).select(
        F.concat(F.lit("conv-"),
                 F.lpad((F.col("id") % 40).cast("string"), 4, "0")
                 ).alias("conv_id"),
        (F.col("id") / 40).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"), F.lit("hello").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    second = spark.range(0, 1200).select(
        F.concat(F.lit("zonv-"),
                 F.lpad((F.col("id") % 40).cast("string"), 4, "0")
                 ).alias("conv_id"),
        (F.col("id") / 40).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"), F.lit("ok").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    tbl.append(base, n_files=4)
    tbl.append(second, n_files=4)

    tbl = Table.load(spark, loc)
    files = tbl.live_data_files()
    assert len(files) == 8
    assert all(bloom_key("conv_id") in f.blooms for f in files)

    pred = [("conv_id", "=", "conv-0007")]
    planned = tbl.plan_scan(pred)
    # the zonv append is provably absent; blooms must drop those 4 files
    assert len(planned) <= 4

    got = sorted(tbl.scan(predicates=pred).collect())
    want = sorted(tbl.scan().filter(F.col("conv_id") == "conv-0007").collect())
    assert got == want and len(got) == 30


def test_fused_key_stats_matches_two_job_path(spark):
    """harvest_key_stats (one fused applyInPandas job) must produce bit-for-
    bit the SAME bloom encodings as the explode-based harvest_blooms, and
    xxh64 bounds equal to the min/max-agg path on null-free data — the
    write path swapped to the fused job purely for speed, so any placement
    drift would silently change which files pruning skips."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.bloom import (
        harvest_key_stats,
    )

    rows = [(f"f{n % 3}", f"conv-{i}") for n, i in
            enumerate([x % 97 for x in range(500)])]
    df = spark.createDataFrame(rows, "fp string, conv_id string")

    legacy = harvest_blooms(df, "fp", ["conv_id"], m=4096)
    agg = (df.groupBy("fp")
           .agg(F.min(F.xxhash64("conv_id")).alias("lo"),
                F.max(F.xxhash64("conv_id")).alias("hi")).collect())
    legacy_bounds = {r["fp"]: (r["lo"], r["hi"]) for r in agg}

    fused = harvest_key_stats(df, "fp", ["conv_id"], ["conv_id"], m=4096)
    assert set(fused) == set(legacy) == {"f0", "f1", "f2"}
    for fp in fused:
        assert fused[fp]["blooms"] == legacy[fp], fp
        assert fused[fp]["hash_bounds"]["conv_id"] == legacy_bounds[fp], fp


def test_fused_key_stats_null_handling(spark):
    """NULL keys are masked out (never hashed into the bloom, never widen
    the xxh64 bounds); an all-null file still yields an entry with an empty
    bloom so pruning can prove every equality probe misses it."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.bloom import (
        harvest_key_stats,
    )

    df = spark.createDataFrame(
        [("a", "k1"), ("a", None), ("b", None), ("b", None)],
        "fp string, c string")
    fused = harvest_key_stats(df, "fp", ["c"], ["c"], m=1024)
    enc_a = fused["a"]["blooms"][bloom_key("c")]
    assert bloom_might_contain(enc_a, "k1")
    # file b: all-null -> empty bloom proves absence of any probe value
    enc_b = fused["b"]["blooms"][bloom_key("c")]
    assert decode_bloom(enc_b)[2] == {}
    assert not bloom_might_contain(enc_b, "k1")
    assert fused["b"]["hash_bounds"] == {}


def test_fused_key_stats_cross_batch_merge(spark):
    """Force each file's rows across MANY Arrow batches (tiny
    maxRecordsPerBatch) so the map-side partial bitsets actually exercise
    the per-file merge: OR-ing partial blooms and folding partial h1
    bounds must be bit-for-bit identical to the single-batch result."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.bloom import (
        harvest_key_stats,
    )

    rows = [(f"f{i // 400}", f"conv-{i % 211}" if i % 13 else None)
            for i in range(1200)]
    df = spark.createDataFrame(rows, "fp string, c string").coalesce(2)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "37")  # ~11 batches per file per partition
        small = harvest_key_stats(df, "fp", ["c"], ["c"], m=2048)
    finally:
        spark.conf.set(key, prev) if prev else spark.conf.unset(key)
    big = harvest_key_stats(df, "fp", ["c"], ["c"], m=2048)

    legacy = harvest_blooms(df, "fp", ["c"], m=2048)
    assert set(small) == set(big) == {"f0", "f1", "f2"}
    for fp in small:
        assert small[fp]["blooms"] == big[fp]["blooms"] == legacy[fp], fp
        assert small[fp]["hash_bounds"] == big[fp]["hash_bounds"], fp


def test_bloomfree_agg_path_matches_pandas_path(spark):
    """With no bloom columns harvest_key_stats takes the pure-Catalyst
    groupBy/agg path (zero Python workers — the post-curve-write hot path);
    its hash bounds must equal the pandas path's for the same data,
    including NULL masking and all-null files."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.bloom import (
        harvest_key_stats,
    )

    rows = [(f"f{i // 300}", f"conv-{i % 113}" if i % 7 else None)
            for i in range(900)] + [("fnull", None)] * 5
    df = spark.createDataFrame(rows, "fp string, c string")

    agg_path = harvest_key_stats(df, "fp", ["c"], [])
    pandas_path = harvest_key_stats(df, "fp", ["c"], ["c"], m=1024)

    assert set(agg_path) == set(pandas_path) == {"f0", "f1", "f2", "fnull"}
    for fp in agg_path:
        assert agg_path[fp]["hash_bounds"] == pandas_path[fp]["hash_bounds"], fp
        assert agg_path[fp]["blooms"] == {}
    assert agg_path["fnull"]["hash_bounds"] == {}


def test_bloom_layouts_curve_policy(spark, tmp_path):
    """stats.bloom.layouts=curve: append- and compaction-era files skip the
    bloom harvest (they are rewritten by the next maintenance pass anyway);
    curve-clustered outputs carry bitsets. Unit: the policy fn; integration:
    a real append -> compact -> zorder cycle."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import (
        layout_bloom_cols,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import (
        ClusteringJob,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import (
        CompactionJob,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        SCHEMA_DDL, generate_transcripts,
    )

    assert layout_bloom_cols(["c"], {}, None) == ["c"]
    assert layout_bloom_cols(["c"], {"stats.bloom.layouts": "curve"}, None) == []
    assert layout_bloom_cols(
        ["c"], {"stats.bloom.layouts": "curve"}, "zorder(conv_id)") == ["c"]
    with pytest.raises(ValueError, match="all|curve"):
        layout_bloom_cols(["c"], {"stats.bloom.layouts": "bogus"}, None)

    df = generate_transcripts(spark, n_convs=20, hot_convs=1, hot_turns=40,
                              span_days=2, seed=3)
    t = Table.create(
        spark, str(tmp_path / "t"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(),
        properties={"stats.columns": "conv_id,turn_idx,role,tool,ts",
                    "stats.bloom-columns": "conv_id",
                    "stats.bloom.layouts": "curve",
                    "write.target-file-size-bytes": str(256 * 1024)})
    t.append(df, n_files=3)
    assert all(not f.blooms for f in t.live_data_files())   # append: none
    CompactionJob(t).run()
    assert all(not f.blooms for f in t.refresh().live_data_files())
    ClusteringJob(t, curve="zorder").run()
    clustered = t.refresh().live_data_files()
    assert clustered and all(f.blooms for f in clustered)   # curve: bitsets
    # scans stay correct either way (absent bloom = conservative keep)
    assert t.scan().count() == df.count()


def test_harvest_10k_files_bounded_driver_residency(spark):
    """Scale-shape check for the harvest's driver side (VERDICT r4 item #3):
    a 10^4-file harvest must stream manifest-sized encoded strings to the
    driver, never the per-(file,column) word-struct Rows. The bitsets are
    encoded JVM-side and lvl2 is consumed via toLocalIterator, so the
    Python-transient peak stays near the size of the final dict (what the
    manifests hold anyway) instead of ~4x it in collected Row structs.

    harvest_key_stats never opens the paths, so synthetic _fp values stand
    in for 10^4 staged files without writing them."""
    import tracemalloc

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.bloom import (
        harvest_key_stats,
    )

    n_files, rows_per_file = 10_000, 4
    df = (spark.range(n_files * rows_per_file)
          .selectExpr("concat('f', id % 10000) AS fp",
                      "concat('conv-', id % 977) AS conv_id"))
    tracemalloc.start()
    out = harvest_key_stats(df, "fp", ["conv_id"], ["conv_id"], m=1 << 13)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(out) == n_files
    # spot-check correctness against the independent explode-based harvester
    probe = df.filter(F.col("fp") == "f7")
    legacy = harvest_blooms(probe, "fp", ["conv_id"], m=1 << 13)
    assert out["f7"]["blooms"] == legacy["f7"]
    # every file's 4 keys must probe positive in its own bloom
    enc = out["f7"]["blooms"][bloom_key("conv_id")]
    for r in probe.collect():
        assert bloom_might_contain(enc, r["conv_id"])
    # residency bound: the final dict itself is ~2-3 MB here; the old
    # collect() of word-struct Rows measured >10x that. 64 MiB is a loose
    # ceiling that still fails on any return to whole-result collection.
    assert peak < 64 * 1024 * 1024, f"driver transient peak {peak/1e6:.0f} MB"
