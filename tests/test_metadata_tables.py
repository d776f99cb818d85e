"""Metadata tables: tbl.files / tbl.partitions / tbl.manifests analogues."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import (
    files, manifests, partitions, run_sql,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


def _table(spark, loc):
    df = generate_transcripts(spark, n_convs=30, span_days=3)
    t = Table.create(
        spark, loc, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
    )
    t.append(df, n_files=2)
    t.append(df, n_files=2)
    return t, df


def test_files_matches_manifest_state(spark, tmp_table_dir):
    t, df = _table(spark, tmp_table_dir)
    live = {f.path: f for f in t.live_data_files()}
    got = files(t).collect()
    assert {r.path for r in got} == set(live)
    for r in got:
        assert r.record_count == live[r.path].record_count
        assert r.file_size_bytes == live[r.path].file_size_bytes
    # rows roll up to the table's row count
    assert sum(r.record_count for r in got) == t.scan().count()


def test_partitions_census(spark, tmp_table_dir):
    t, df = _table(spark, tmp_table_dir)
    got = {
        r.partition["ts_day"]: r.record_count
        for r in partitions(t).collect()
    }
    want = {
        str(r.d): r.n
        for r in df.groupBy(F.to_date("ts").alias("d"))
        .agg((F.count("*") * 2).alias("n")).collect()
    }
    assert got == want


def test_manifests_and_sql_statements(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_database("db")
    t = cat.create_table(
        "db.m", T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
    )
    df = generate_transcripts(spark, n_convs=10, span_days=2)
    t.append(df, n_files=1)
    t.append(df, n_files=1)

    m = run_sql(cat, "DESCRIBE MANIFESTS db.m").collect()
    assert len(m) == 2  # one manifest per append
    assert all(r.added_files_count + r.existing_files_count > 0 for r in m)
    assert all("ts_day" in r.partition_summaries for r in m)

    f = run_sql(cat, "DESCRIBE FILES db.m")
    p = run_sql(cat, "DESCRIBE PARTITIONS db.m")
    assert f.count() == len(t.live_data_files())
    assert (p.agg(F.sum("record_count")).first()[0] == t.scan().count())
