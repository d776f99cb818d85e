"""Continuous aggregates: materialized views with a time_bucket group key
(operators/matview.py Bucket). The refresh invariant must hold through
appends, upserts (eqdel parent derivation), deletes (min/max dirty buckets),
and the dirty recompute must be scoped by the dirty buckets' TIME RANGE, not
an unprunable derived-column IN list."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import DeleteJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.matview import (
    Agg, Bucket, MatViewDefn, _dirty_scan_predicates, create_materialized_view,
    full_state, read_view, refresh, user_columns,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.upsert import upsert
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql

HOUR = 3600

DEFN = MatViewDefn(
    group_keys=("hour", "role"),
    aggs=(
        Agg("count_star", None, "n_rows"),
        Agg("sum", "turn_idx", "sum_turn"),
        Agg("min", "turn_idx", "min_turn"),
        Agg("max", "ts", "last_ts"),
    ),
    buckets=(Bucket("hour", "ts", HOUR),),
)


@pytest.fixture()
def base(spark):
    return generate_transcripts(
        spark, n_convs=30, hot_convs=1, span_days=2, seed=17).cache()


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def make_source(cat, base):
    t = cat.create_table(
        "default.src", T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"write.target-file-size-bytes": str(512 * 1024),
                    "stats.columns": "conv_id,turn_idx,role,tool,ts",
                    "write.change-data-feed.enabled": "true"})
    t.append(base, n_files=2, sort_within=("conv_id", "turn_idx"))
    return t.refresh()


def canon(df, defn=DEFN):
    return sorted(
        (tuple(r[c] for c in user_columns(defn)) for r in df.collect()),
        key=str)


def assert_current(mv, src, defn=DEFN):
    assert canon(read_view(mv.refresh()), defn) == \
        canon(full_state(src.refresh().scan(), defn), defn)


def test_initial_build_buckets(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.cagg", "default.src", DEFN)
    assert_current(mv, src)
    # bucket values are epoch-aligned hour starts
    for r in read_view(mv).select("hour").collect():
        assert int(r["hour"].timestamp()) % HOUR == 0


def test_append_dirty_buckets_only(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.cagg", "default.src", DEFN)
    extra = base.filter(F.col("turn_idx") < 2) \
                .withColumn("role", F.lit("auditor"))
    src.append(extra, n_files=1)
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_current(mv, src)


def test_upsert_eqdel_parent_derivation(cat, base):
    """Upsert keys don't carry the bucket column, so dirty buckets must come
    from the parent-snapshot scan — the non-subset eqdel path."""
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.cagg", "default.src", DEFN)
    batch = (src.scan().filter(F.col("turn_idx") == 0)
             .withColumn("turn_idx", F.lit(500)))
    upsert(src, batch, ["conv_id", "turn_idx"], n_files=1)
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_current(mv, src)


def test_delete_dirties_min_bucket(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.cagg", "default.src", DEFN)
    DeleteJob(src, [("turn_idx", "<", 1)]).run()  # every bucket's min cand
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_current(mv, src)


def test_dirty_scan_predicates_are_time_range(spark):
    dirty = spark.createDataFrame(
        [(1,), (2,)], "h long"
    ).select(F.timestamp_seconds(F.col("h") * HOUR).alias("hour"),
             F.lit("user").alias("role"))
    preds = _dirty_scan_predicates(dirty, DEFN)
    assert preds == [("ts", ">=", "1970-01-01 01:00:00"),
                     ("ts", "<", "1970-01-01 03:00:00")]


def test_sql_create_and_refresh(cat, base):
    src = make_source(cat, base)
    run_sql(cat, """
        CREATE MATERIALIZED VIEW default.cagg AS
        SELECT time_bucket(3600, ts) AS hour, role,
               count(*) AS n_rows, sum(turn_idx) AS sum_turn
        FROM default.src
        GROUP BY hour, role
    """)
    mv = cat.load_table("default.cagg")
    defn = MatViewDefn(
        group_keys=("hour", "role"),
        aggs=(Agg("count_star", None, "n_rows"),
              Agg("sum", "turn_idx", "sum_turn")),
        buckets=(Bucket("hour", "ts", HOUR),))
    assert canon(read_view(mv), defn) == \
        canon(full_state(src.scan(), defn), defn)
    src.append(base.limit(50), n_files=1)
    run_sql(cat, "REFRESH MATERIALIZED VIEW default.cagg")
    assert canon(read_view(mv.refresh()), defn) == \
        canon(full_state(src.refresh().scan(), defn), defn)


def test_validate_rejects_bad_buckets(cat, base):
    src = make_source(cat, base)
    with pytest.raises(ValueError, match="timestamp"):
        MatViewDefn(("b",), (Agg("count_star", None, "n"),),
                    buckets=(Bucket("b", "turn_idx", 60),)).validate(src.schema)
    with pytest.raises(ValueError, match="group key"):
        MatViewDefn(("role",), (Agg("count_star", None, "n"),),
                    buckets=(Bucket("b", "ts", 60),)).validate(src.schema)
    with pytest.raises(ValueError, match="shadows"):
        MatViewDefn(("role",), (Agg("count_star", None, "n"),),
                    buckets=(Bucket("role", "ts", 60),)).validate(src.schema)
    with pytest.raises(ValueError, match="one time_bucket"):
        MatViewDefn(("a", "b"), (Agg("count_star", None, "n"),),
                    buckets=(Bucket("a", "ts", 60),
                             Bucket("b", "ts", 120),)).validate(src.schema)
