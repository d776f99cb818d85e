"""ANALYZE TABLE column statistics: one-pass aggregation, persistence with
snapshot stamping, staleness, exact vs HLL NDV, SQL statements."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.analyze import (
    analyze_table, describe_stats, read_stats,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import (
    equality_delete,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql


@pytest.fixture()
def table(spark, tmp_path):
    df = generate_transcripts(spark, n_convs=25, hot_convs=1, hot_turns=50,
                              span_days=3, seed=71).cache()
    t = Table.create(
        spark, str(tmp_path / "t"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"write.target-file-size-bytes": str(512 * 1024)},
    )
    t.append(df, n_files=2)
    return t, df


def test_exact_stats_match_dataframe_truth(table):
    t, df = table
    res = analyze_table(t, ["conv_id", "turn_idx", "tool"], exact=True)
    truth = df.agg(
        F.count(F.lit(1)), F.countDistinct("conv_id"),
        F.countDistinct("turn_idx"), F.count("tool"),
        F.min("turn_idx"), F.max("turn_idx"),
    ).collect()[0]
    assert res.rows == truth[0]
    assert res.columns["conv_id"]["ndv"] == truth[1]
    assert res.columns["turn_idx"]["ndv"] == truth[2]
    assert res.columns["tool"]["null_count"] == truth[0] - truth[3]
    assert res.columns["turn_idx"]["min"] == truth[4]
    assert res.columns["turn_idx"]["max"] == truth[5]
    assert res.columns["conv_id"]["avg_len"] is not None


def test_hll_ndv_within_tolerance(table):
    t, df = table
    res = analyze_table(t, ["conv_id"], exact=False, rsd=0.05)
    truth = df.select("conv_id").distinct().count()
    assert abs(res.columns["conv_id"]["ndv"] - truth) <= max(3, 0.15 * truth)
    assert res.columns["conv_id"]["ndv_exact"] is False


def test_persistence_and_staleness(table, spark):
    t, df = table
    analyze_table(t, ["conv_id"], exact=True)
    stored = read_stats(t)
    assert stored["snapshot_id"] == t.current_snapshot().snapshot_id
    rows = describe_stats(t)
    assert rows and not rows[0]["stale"]
    # stats survive scans AND are marked stale after a new commit
    equality_delete(t, spark.createDataFrame([("conv-0000000003",)],
                                             "conv_id string"))
    rows = describe_stats(t)
    assert rows[0]["stale"] is True
    assert rows[0]["analyzed_snapshot_id"] == stored["snapshot_id"]


def test_stats_run_over_delete_applied_scan(table, spark):
    t, df = table
    victims = [r["conv_id"] for r in
               df.select("conv_id").distinct().limit(2).collect()]
    equality_delete(t, spark.createDataFrame([(c,) for c in victims],
                                             "conv_id string"))
    res = analyze_table(t, ["conv_id"], exact=True)
    live = df.filter(~F.col("conv_id").isin(victims))
    assert res.rows == live.count()
    assert res.columns["conv_id"]["ndv"] == live.select("conv_id").distinct().count()


def test_unknown_column_rejected(table):
    t, _ = table
    with pytest.raises(ValueError, match="unknown columns"):
        analyze_table(t, ["nope"])


def test_sql_statements(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_database("ops")
    t = c.create_table("ops.t", T.StructType.fromDDL(SCHEMA_DDL),
                       PartitionSpec.of(days("ts_day", "ts")))
    t.append(generate_transcripts(spark, n_convs=10, hot_convs=0,
                                  span_days=2, seed=5), n_files=1)
    res = run_sql(
        c, "ANALYZE TABLE ops.t COMPUTE STATISTICS FOR COLUMNS (conv_id, role)")
    assert set(res.columns) == {"conv_id", "role"}
    rows = run_sql(c, "DESCRIBE STATS ops.t")
    assert [r["column"] for r in rows] == ["conv_id", "role"]
    assert rows[0]["rows"] == res.rows


def test_sql_analyze_frequency_columns(spark, tmp_path):
    """ANALYZE ... FOR FREQUENCY COLUMNS records top_count, DESCRIBE STATS
    shows it, and the merge planner derives salting from it."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.plans.costs import (
        suggest_salt_buckets,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        generate_transcripts,
    )

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("default.t", T.StructType.fromDDL(SCHEMA_DDL))
    t.append(generate_transcripts(spark, n_convs=30, hot_convs=1,
                                  hot_turns=2000, span_days=3), n_files=1)
    run_sql(cat,
            "ANALYZE TABLE default.t COMPUTE STATISTICS "
            "FOR FREQUENCY COLUMNS (conv_id)")
    rows = run_sql(cat, "DESCRIBE STATS default.t")
    by_col = {r["column"]: r for r in rows}
    assert by_col["conv_id"]["top_count"] >= 2000
    assert suggest_salt_buckets(cat.load_table("default.t"), "conv_id") >= 2
