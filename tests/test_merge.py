"""MERGE INTO: upsert semantics, file scoping, dedup, skew (salted), oracle equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.merge import MergeIntoJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


def schema():
    return T.StructType.fromDDL(SCHEMA_DDL)


@pytest.fixture()
def merge_table(spark, tmp_table_dir):
    df = generate_transcripts(spark, n_convs=100, hot_convs=2, hot_turns=200, span_days=10)
    t = Table.create(
        spark, tmp_table_dir, schema(),
        PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 2)),
        properties={"write.target-file-size-bytes": str(512 * 1024)},
    )
    t.append(df, n_files=2, sort_within=("conv_id", "turn_idx"))
    return t, df.cache()


def oracle_merge(target_df, source_df, mode="update"):
    """Plain-DataFrame merge oracle (SURVEY.md §5 gold conformance)."""
    keys = ["conv_id", "turn_idx"]
    keep = target_df.join(source_df.select(*keys), keys, "left_anti")
    ins = source_df.join(target_df.select(*keys), keys, "left_anti")
    upd = source_df.join(target_df.select(*keys), keys, "inner") if mode == "update" else None
    out = keep.unionByName(ins)
    if upd is not None:
        out = out.unionByName(upd)
    return out


def rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda x: (x[0], x[1], str(x[5])),
    )


def test_merge_update_and_insert(spark, merge_table):
    t, df = merge_table
    # corrections for an existing conv + a brand-new conv
    some_conv = df.select("conv_id").distinct().orderBy("conv_id").collect()[3][0]
    updates = (
        df.filter(F.col("conv_id") == some_conv)
        .withColumn("text", F.concat(F.lit("CORRECTED:"), "text"))
    )
    inserts = updates.withColumn("conv_id", F.lit("conv-new-9999"))
    source = updates.unionByName(inserts)

    before_total = t.scan().count()
    res = MergeIntoJob(t).run(source)
    assert res.rows_updated == updates.count()
    assert res.rows_inserted == inserts.count()
    assert res.files_scoped < res.files_total  # manifest scoping pruned files

    got = rows(t.scan())
    want = rows(oracle_merge(df, source))
    assert got == want
    assert t.scan().count() == before_total + inserts.count()
    assert (
        t.scan([("conv_id", "=", some_conv)])
        .filter(~F.col("text").startswith("CORRECTED:")).count() == 0
    )


def test_merge_delete_mode(spark, merge_table):
    t, df = merge_table
    victim = df.select("conv_id").distinct().orderBy("conv_id").collect()[1][0]
    source = df.filter(F.col("conv_id") == victim)
    res = MergeIntoJob(t, when_matched="delete", when_not_matched="ignore").run(source)
    assert res.rows_deleted == source.count()
    assert t.scan([("conv_id", "=", victim)]).count() == 0
    assert t.scan().count() == df.count() - source.count()


def test_merge_source_dedup_last_writer_wins(spark, merge_table):
    t, df = merge_table
    conv = df.select("conv_id").distinct().orderBy("conv_id").collect()[2][0]
    base = df.filter((F.col("conv_id") == conv) & (F.col("turn_idx") == 0))
    old = base.withColumn("text", F.lit("OLD")).withColumn("ts", F.expr("ts - interval 1 hour"))
    new = base.withColumn("text", F.lit("NEW"))
    MergeIntoJob(t).run(old.unionByName(new))
    got = t.scan([("conv_id", "=", conv), ("turn_idx", "=", 0)]).select("text").collect()
    assert [r[0] for r in got] == ["NEW"]


def test_merge_salted_matches_plain(spark, merge_table):
    t, df = merge_table
    hot = df.select("conv_id").groupBy("conv_id").count().orderBy(F.desc("count")).first()[0]
    source = (
        df.filter(F.col("conv_id") == hot)
        .withColumn("text", F.concat(F.lit("HOT:"), "text"))
    )
    res = MergeIntoJob(t, salt_buckets=8).run(source)
    assert res.rows_updated == source.count()
    got = rows(t.scan())
    want = rows(oracle_merge(df, source))
    assert got == want


def test_merge_into_empty_table_inserts(spark, tmp_table_dir):
    df = generate_transcripts(spark, n_convs=10, hot_convs=0, span_days=2)
    t = Table.create(spark, tmp_table_dir, schema(),
                     PartitionSpec.of(days("ts_day", "ts")))
    res = MergeIntoJob(t).run(df)
    assert res.rows_inserted == df.count()
    assert t.scan().count() == df.count()


def test_merge_snapshot_isolation(spark, merge_table):
    t, df = merge_table
    pre = t.current_snapshot().snapshot_id
    pre_rows = rows(t.scan(snapshot_id=pre))
    src = df.limit(20).withColumn("text", F.lit("X"))
    MergeIntoJob(t).run(src)
    assert rows(t.scan(snapshot_id=pre)) == pre_rows


def test_distributed_scoping_matches_driver(spark, merge_table):
    """scope_paths_distributed (executor-side manifest decode) returns exactly
    the driver-side _scope_files affected set."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.merge import (
        _scope_files, scope_paths_distributed,
    )
    from pyspark.sql import functions as F

    t, df = merge_table
    source = df.filter(F.col("conv_id").isin(
        [r["conv_id"] for r in df.select("conv_id").distinct().limit(3).collect()]
    ))
    affected, untouched = _scope_files(t, source, "conv_id")
    got = scope_paths_distributed(t, source, "conv_id")
    assert got == {f.path for f in affected}
    assert got.isdisjoint({f.path for f in untouched})
    assert 0 < len(got) < len(affected) + len(untouched)


def test_merge_uses_distributed_scoping_past_threshold(spark, merge_table):
    """With merge.scope.distributed-min-files=0 the job takes the
    executor-side scoping path; results are identical to the oracle."""
    t, df = merge_table
    t.set_property("merge.scope.distributed-min-files", "0")
    convs = [r["conv_id"]
             for r in df.select("conv_id").distinct().limit(3).collect()]
    src = (df.filter(F.col("conv_id").isin(convs))
           .withColumn("text", F.concat(F.lit("d:"), "text")))
    want = rows(oracle_merge(df, src))
    res = MergeIntoJob(t).run(src)
    assert res.files_scoped < res.files_total  # scoping still pruned
    t.refresh()
    assert rows(t.scan()) == want


def test_second_dimension_scoping_tightens(spark, merge_table):
    """Scoping on (conv_id, turn_idx) tuples must (a) agree between the
    driver and distributed variants, (b) never scope MORE files than
    conv_id alone, and (c) strictly fewer when the source touches only a
    narrow turn range of a conversation whose files split by turn_idx."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.merge import (
        _scope_files, scope_paths_distributed,
    )

    t, df = merge_table
    hot = (df.groupBy("conv_id").count()
           .orderBy(F.desc("count")).first()["conv_id"])
    # the hot conversation spans multiple 512KB files (sorted by turn_idx);
    # a source touching only its first 3 turns must not scope the tail files
    source = df.filter((F.col("conv_id") == hot) & (F.col("turn_idx") < 3))

    one_dim, _ = _scope_files(t, source, "conv_id")
    two_dim, _ = _scope_files(t, source, ["conv_id", "turn_idx"])
    assert {f.path for f in two_dim} <= {f.path for f in one_dim}
    got = scope_paths_distributed(t, source, ["conv_id", "turn_idx"])
    assert got == {f.path for f in two_dim}

    # the merge itself stays oracle-correct with tuple scoping
    res = MergeIntoJob(t).run(
        source.withColumn("text", F.lit("patched")))
    assert res.rows_updated == source.count()
    assert rows(t.scan()) == rows(oracle_merge(
        df, source.withColumn("text", F.lit("patched"))))


def test_bloom_scoping_drops_bounds_overlapping_files(spark, tmp_table_dir):
    """Per-file conv_id blooms are the third scoping layer: a time-ordered
    append holds an arbitrary conv mix per file (wide bounds — bounds-only
    scoping keeps everything), but the bloom proves which files actually
    contain the merge keys."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.merge import (
        _bloom_filter_affected, _scope_files,
    )

    df = generate_transcripts(spark, n_convs=200, hot_convs=0, span_days=2,
                              seed=11)
    t = Table.create(
        spark, tmp_table_dir, schema(),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"write.target-file-size-bytes": str(256 * 1024),
                    "stats.bloom-columns": "conv_id"},
    )
    # ts-sorted append: every file spans nearly the whole conv_id range
    t.append(df.orderBy("ts"), n_files=6)
    convs = sorted({r["conv_id"] for r in df.select("conv_id").collect()})
    source = (df.filter(F.col("conv_id") == convs[len(convs) // 2])
              .withColumn("text", F.lit("patched")).cache())

    bounds_only, _ = _scope_files(t, source, ["conv_id", "turn_idx"])
    bloomed = _bloom_filter_affected(bounds_only, source, "conv_id")
    truth = {
        r["_f"] for r in
        t.scan().filter(F.col("conv_id") == convs[len(convs) // 2])
        .select(F.col("_metadata.file_path").alias("_f")).distinct().collect()
    }
    # no false negatives: every file really holding the key survives
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import (
        normalize_path,
    )
    kept = {f.path for f in bloomed}
    assert {normalize_path(p) for p in truth} <= kept
    assert len(bloomed) < len(bounds_only)  # and the bloom actually pruned

    # end-to-end: the merge stays oracle-correct with bloom scoping active
    res = MergeIntoJob(t).run(source)
    assert res.rows_updated == source.count()
    assert rows(t.scan()) == rows(oracle_merge(df, source))


def test_merge_auto_salt_from_analyze_stats(spark, tmp_table_dir):
    """With ANALYZE frequency stats persisted, salt_buckets=None derives the
    salted plan automatically: the hot conversation (far beyond an average
    shuffle partition) triggers the same bucket count a hand-tuned job
    would pick, results stay oracle-equal, and an unskewed key draws no
    salting."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.analyze import (
        analyze_table,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.plans.costs import (
        suggest_salt_buckets,
    )

    df = generate_transcripts(spark, n_convs=50, hot_convs=1, hot_turns=3000,
                              span_days=5)
    t = Table.create(
        spark, tmp_table_dir, schema(),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"write.target-file-size-bytes": str(512 * 1024)},
    )
    t.append(df, n_files=2, sort_within=("conv_id", "turn_idx"))

    assert suggest_salt_buckets(t, "conv_id") is None  # no stats: no guess
    res = analyze_table(t, frequency_columns=["conv_id"])
    assert res.columns["conv_id"]["top_count"] >= 3000

    expect = suggest_salt_buckets(t, "conv_id")
    assert expect is not None and expect >= 2
    # the unskewed key (turn_idx frequencies are ~n_convs) stays plain when
    # the hot count sits within skew_factor average partitions
    rows_total = df.count()
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if 50 <= 4.0 * rows_total / parts:  # turn frequencies ≈ n_convs = 50
        analyze_table(t, frequency_columns=["turn_idx"])
        assert suggest_salt_buckets(t, "turn_idx") is None

    hot = (df.groupBy("conv_id").count().orderBy(F.desc("count"))
           .first()["conv_id"])
    source = (df.filter(F.col("conv_id") == hot)
              .withColumn("text", F.concat(F.lit("HOT:"), "text")))
    job = MergeIntoJob(t)  # salt_buckets=None -> auto
    res = job.run(source)
    assert job._resolved_salt == expect, "auto must match the derived plan"
    assert res.rows_updated == source.count()
    assert rows(t.scan()) == rows(oracle_merge(df, source))

    # explicit 0 pins the unsalted plan even with stats present
    job2 = MergeIntoJob(t, salt_buckets=0)
    job2.run(source.withColumn("text", F.concat(F.lit("X:"), "text")))
    assert job2._resolved_salt == 0
