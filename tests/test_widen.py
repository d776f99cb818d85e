"""ALTER COLUMN TYPE: metadata-only lossless type widening across file eras
(Delta type-widening / Iceberg type-promotion analogue; shares _WIDEN_TABLE
with the implicit merge-schema append path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days, identity,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


@pytest.fixture()
def base(spark):
    return generate_transcripts(spark, n_convs=8, hot_convs=0, span_days=2)


def make_table(spark, loc, df, **props):
    t = Table.create(
        spark, loc, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts"), bucket("cb", "conv_id", 2)),
        properties={"stats.columns": "conv_id,turn_idx,ts", **props},
    )
    t.append(df, n_files=2)
    return t


def test_widen_int_to_bigint_across_eras(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    old_rows = t.scan().count()
    t.widen_column("turn_idx", T.LongType())
    assert dict((f.name, f.dataType.simpleString())
                for f in t.schema.fields)["turn_idx"] == "bigint"
    # old int32 files read back at the widened type, values intact
    got = t.scan()
    assert got.schema["turn_idx"].dataType == T.LongType()
    assert got.count() == old_rows
    # new era appends at the wide type; both eras scan together
    t.append(base.withColumn("turn_idx",
                             (F.col("turn_idx") + 1000).cast("bigint")),
             n_files=2)
    assert t.scan().count() == 2 * old_rows
    assert t.scan([("turn_idx", ">=", 1000)]).count() == old_rows
    # pruning on old-era int bounds still plans correctly
    lo = t.scan([("turn_idx", "<", 1000)])
    assert lo.count() == old_rows


def test_widen_rejects_lossy_and_unknown(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    with pytest.raises(ValueError, match="losslessly"):
        t.widen_column("turn_idx", T.StringType())
    with pytest.raises(ValueError, match="losslessly"):
        t.widen_column("text", T.BinaryType())
    with pytest.raises(ValueError, match="unknown column"):
        t.widen_column("nope", T.LongType())
    with pytest.raises(ValueError, match="already"):
        t.widen_column("text", T.StringType())


def test_widen_rejects_partition_source_and_hash_cols(spark, tmp_path, base):
    loc = str(tmp_path / "t")
    t = Table.create(
        spark, loc, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(identity("turn_idx", "turn_idx")),
        properties={"stats.hash-columns": "conv_id"},
    )
    t.append(base, n_files=1)
    with pytest.raises(ValueError, match="partition-spec source"):
        t.widen_column("turn_idx", T.LongType())
    t2 = make_table(spark, str(tmp_path / "t2"), base,
                    **{"stats.hash-columns": "turn_idx"})
    with pytest.raises(ValueError, match="hash/bloom"):
        t2.widen_column("turn_idx", T.LongType())


def test_widen_int_to_double_and_eqdel_era(spark, tmp_path, base):
    """int -> double is lossless for int32; an eqdel keyed on the old-typed
    column keeps applying under Spark's implicit numeric casts."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import (
        equality_delete,
    )

    t = make_table(spark, str(tmp_path / "t"), base)
    t.widen_column("turn_idx", T.DoubleType())
    victims = [r["conv_id"] for r in
               base.select("conv_id").distinct().limit(2).collect()]
    equality_delete(t, spark.createDataFrame([(v,) for v in victims],
                                             "conv_id string"))
    assert t.scan().filter(F.col("conv_id").isin(victims)).count() == 0
    assert t.scan().schema["turn_idx"].dataType == T.DoubleType()


def test_sql_alter_column_type_and_show_create(spark, tmp_path, base):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_sql(cat, "CREATE DATABASE db")
    t = cat.create_table("db.t", T.StructType.fromDDL(SCHEMA_DDL))
    t.append(base, n_files=1)
    run_sql(cat, "ALTER TABLE db.t ALTER COLUMN turn_idx TYPE BIGINT")
    t.refresh()
    assert t.schema["turn_idx"].dataType == T.LongType()
    ddl = run_sql(cat, "SHOW CREATE TABLE db.t").collect()[0][0]
    assert "turn_idx BIGINT" in ddl or "turn_idx bigint" in ddl.lower()
    with pytest.raises(ValueError, match="losslessly"):
        run_sql(cat, "ALTER TABLE db.t ALTER COLUMN role TYPE INT")


def test_widen_then_rename_compose(spark, tmp_path, base):
    """Widen + rename on the same column: old-name twin columns in the read
    schema take the CURRENT (wider) type, so pre-rename pre-widen files
    upcast under their historical name."""
    t = make_table(spark, str(tmp_path / "t"), base)
    n = t.scan().count()
    t.widen_column("turn_idx", T.LongType())
    t.rename_column("turn_idx", "turn_no")
    t.append(base.withColumnRenamed("turn_idx", "turn_no")
                 .withColumn("turn_no", (F.col("turn_no") + 500).cast("bigint")),
             n_files=1)
    got = t.scan(columns=["conv_id", "turn_no"])
    assert got.schema["turn_no"].dataType == T.LongType()
    assert got.count() == 2 * n
