"""Incremental micro-batch pipeline: checkpointed discovery, exactly-once appends."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import PartitionSpec
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.streaming.incremental import (
    FileStreamSource, IncrementalTableReader, run_micro_batches,
)

# fromDDL needs an active session; build the schema directly
EVENT_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("action", T.StringType()),
    T.StructField("v", T.LongType()),
])


def _write_json(dirpath: str, name: str, rows: list[dict]) -> str:
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return p


@pytest.fixture()
def landing(tmp_path):
    d = str(tmp_path / "landing")
    _write_json(d, "a.json", [{"id": i, "action": "create", "v": i * 2} for i in range(10)])
    _write_json(d, "b.json", [{"id": i, "action": "delete", "v": i} for i in range(10, 15)])
    return d


def test_file_source_discovers_then_drains(spark, landing, tmp_path):
    src = FileStreamSource(spark, landing, str(tmp_path / "cp.json"),
                           fmt="json", schema=EVENT_SCHEMA)
    b1 = src.next_batch()
    assert b1 is not None and len(b1.files) == 2
    assert b1.df.count() == 15
    src.commit(b1)
    assert src.next_batch() is None  # drained
    _write_json(landing, "c.json", [{"id": 99, "action": "x", "v": 0}])
    b2 = src.next_batch()
    assert b2.batch_id == b1.batch_id + 1
    assert [os.path.basename(f) for f in b2.files] == ["c.json"]


def test_micro_batches_into_table_exactly_once(spark, landing, tmp_path):
    src = FileStreamSource(spark, landing, str(tmp_path / "cp.json"),
                           fmt="json", schema=EVENT_SCHEMA)
    t = Table.create(spark, str(tmp_path / "tbl"), EVENT_SCHEMA, PartitionSpec.unpartitioned())
    n = run_micro_batches(src, t, lambda df: df.withColumn("v", F.col("v") + 1))
    assert n == 1
    assert t.scan().count() == 15
    # rerun with no new files: nothing happens
    assert run_micro_batches(src, t) == 0
    assert t.scan().count() == 15
    # crash simulation: append committed but checkpoint not -> rerun skips re-apply
    _write_json(landing, "d.json", [{"id": 200, "action": "y", "v": 5}])
    b = src.next_batch()
    t.append(b.df, summary_extra={"batch-id": b.batch_id})
    # (no src.commit -> "crash" here)
    assert run_micro_batches(src, t) == 0  # batch-id marker detected, not re-applied
    assert t.scan().filter(F.col("id") == 200).count() == 1


def test_incremental_table_reader(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"), EVENT_SCHEMA, PartitionSpec.unpartitioned())
    df1 = spark.createDataFrame([(1, "a", 1), (2, "b", 2)], EVENT_SCHEMA)
    df2 = spark.createDataFrame([(3, "c", 3)], EVENT_SCHEMA)
    reader = IncrementalTableReader(t, str(tmp_path / "rcp.json"))
    assert reader.next_batch() is None  # empty table
    t.append(df1)
    b1 = reader.next_batch()
    assert b1.df.count() == 2
    reader.commit(b1)
    assert reader.next_batch() is None  # caught up
    t.append(df2)
    b2 = reader.next_batch()
    assert [r["id"] for r in b2.df.collect()] == [3]  # only the new append
    reader.commit(b2)


def test_medallion_chain_bronze_silver(spark, landing, tmp_path):
    """bronze (file source) -> silver (incremental table reader) end to end."""
    bronze = Table.create(spark, str(tmp_path / "bronze"), EVENT_SCHEMA,
                          PartitionSpec.unpartitioned())
    silver_schema = T.StructType(
        EVENT_SCHEMA.fields + [T.StructField("sev", T.IntegerType())]
    )
    silver = Table.create(spark, str(tmp_path / "silver"), silver_schema,
                          PartitionSpec.unpartitioned())
    src = FileStreamSource(spark, landing, str(tmp_path / "cp1.json"),
                           fmt="json", schema=EVENT_SCHEMA)
    run_micro_batches(src, bronze)
    reader = IncrementalTableReader(bronze, str(tmp_path / "cp2.json"))
    run_micro_batches(
        reader, silver,
        lambda df: df.withColumn(
            "sev", F.when(F.col("action") == "delete", 5).otherwise(1)
        ),
    )
    assert silver.scan().count() == 15
    assert silver.scan().filter("sev = 5").count() == 5
