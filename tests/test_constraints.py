"""Delta-style CHECK / NOT NULL constraint enforcement on the write path."""

from __future__ import annotations

import pytest

def test_check_and_not_null_constraints(spark, tmp_path):
    """Delta-style write-path constraint enforcement: NOT NULL columns and
    named CHECK expressions reject violating ingest batches (NULL check
    result counts as a violation); clean batches commit; constraints apply
    to append, stage_append and branch appends."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec, days,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        SCHEMA_DDL, generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=10, hot_convs=0, span_days=2)
    t = Table.create(
        spark, str(tmp_path / "t"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={
            "constraints.not-null": "conv_id,ts",
            "constraints.check.turn_nonneg": "turn_idx >= 0",
        },
    )
    t.append(df, n_files=1)  # clean batch commits
    n0 = t.scan().count()

    bad_null = df.withColumn(
        "conv_id", F.when(F.col("turn_idx") == 2, None)
        .otherwise(F.col("conv_id")))
    with pytest.raises(ValueError, match="NOT NULL conv_id"):
        t.append(bad_null, n_files=1)

    bad_check = df.withColumn(
        "turn_idx", F.when(F.col("turn_idx") == 3, -1)
        .otherwise(F.col("turn_idx")))
    with pytest.raises(ValueError, match="CHECK turn_nonneg"):
        t.append(bad_check, n_files=1)
    with pytest.raises(ValueError, match="CHECK turn_nonneg"):
        t.stage_append(bad_check, n_files=1)
    t.create_branch("dev")
    with pytest.raises(ValueError, match="CHECK turn_nonneg"):
        t.append_to_branch("dev", bad_check, n_files=1)

    # NULL check result is a violation (Delta semantics)
    t.set_property("constraints.check.tool_known", "tool IN ('search')")
    bad_nullexpr = df.withColumn("tool", F.lit(None).cast("string"))
    with pytest.raises(ValueError, match="CHECK tool_known"):
        t.append(bad_nullexpr, n_files=1)

    t.refresh()
    assert t.scan().count() == n0  # nothing bad ever landed


def test_constraint_sql_statements(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec, days,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        SCHEMA_DDL, generate_transcripts,
    )

    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_database("ops")
    t = c.create_table("ops.t", T.StructType.fromDDL(SCHEMA_DDL),
                       PartitionSpec.of(days("ts_day", "ts")))
    run_sql(c, "ALTER TABLE ops.t ADD CONSTRAINT role_ok "
               "CHECK (role IN ('user','assistant','system','tool'))")
    df = generate_transcripts(spark, n_convs=5, hot_convs=0, span_days=1)
    t.refresh()
    t.append(df, n_files=1)
    bad = df.withColumn("role", F.lit("alien"))
    with pytest.raises(ValueError, match="CHECK role_ok"):
        t.append(bad, n_files=1)
    run_sql(c, "ALTER TABLE ops.t DROP CONSTRAINT role_ok")
    t.refresh()
    t.append(bad, n_files=1)  # constraint gone
    with pytest.raises(ValueError, match="unknown constraint"):
        run_sql(c, "ALTER TABLE ops.t DROP CONSTRAINT nope")


def test_update_and_merge_enforce_constraints(spark, tmp_path):
    """UPDATE and MERGE rewrite rows — their output must pass declared
    constraints like any other written data (Delta CHECK semantics)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec, days,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.merge import MergeIntoJob
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.update import UpdateJob
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        SCHEMA_DDL, generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=8, hot_convs=0, span_days=1)
    t = Table.create(
        spark, str(tmp_path / "t"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"constraints.check.turn_nonneg": "turn_idx >= 0"},
    )
    t.append(df, n_files=1)
    before = sorted(r["turn_idx"] for r in t.scan().collect())

    with pytest.raises(ValueError, match="CHECK turn_nonneg"):
        UpdateJob(t, [("turn_idx", "=", 0)], {"turn_idx": "-1"}).run()
    with pytest.raises(ValueError, match="CHECK turn_nonneg"):
        MergeIntoJob(t, key_cols=["conv_id"]).run(
            df.limit(4).withColumn("turn_idx", F.lit(-5)))
    t.refresh()
    assert sorted(r["turn_idx"] for r in t.scan().collect()) == before

    # clean UPDATE / MERGE still commit
    UpdateJob(t, [("turn_idx", "=", 0)], {"role": "'system'"}).run()
    t.refresh()
    assert t.scan().filter(
        (F.col("turn_idx") == 0) & (F.col("role") != "system")).count() == 0


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    """ALTER TABLE ADD CONSTRAINT scans the current snapshot first: a
    constraint the existing data violates must not persist."""
    from pyspark.sql import types as T

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
        PartitionSpec,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
        SCHEMA_DDL, generate_transcripts,
    )

    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_database("ops")
    t = c.create_table("ops.t", T.StructType.fromDDL(SCHEMA_DDL),
                       PartitionSpec.of())
    t.append(generate_transcripts(spark, n_convs=5, hot_convs=0, span_days=1),
             n_files=1)
    with pytest.raises(ValueError, match="existing row violates"):
        run_sql(c, "ALTER TABLE ops.t ADD CONSTRAINT impossible "
                   "CHECK (turn_idx < 0)")
    t.refresh()
    assert "constraints.check.impossible" not in t.meta.properties
    # a satisfiable constraint persists and enforces going forward
    run_sql(c, "ALTER TABLE ops.t ADD CONSTRAINT turn_nonneg "
               "CHECK (turn_idx >= 0)")
    t.refresh()
    assert t.meta.properties["constraints.check.turn_nonneg"] == "turn_idx >= 0"
