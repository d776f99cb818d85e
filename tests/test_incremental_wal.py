"""Planned-batch WAL: crash-heal must replay the EXACT planned batch.

Covers the failure the WAL exists for (see streaming/incremental.py module
doc): a crash lands the table commit but not the checkpoint, and the source
changes before the re-run. Without the WAL the heal would re-LIST, absorb the
new arrivals into the already-applied batch id, and mark them processed
without ingesting them (silent loss) — or, with ``max_files`` truncation
shifting the sorted window, duplicate the crashed batch's rows.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import PartitionSpec
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.copy_into import copy_into
from e2e_ocsf_cyber_lakehouse_blueprint_spark.streaming.incremental import (
    ChangeFeedReader, FileStreamSource, IncrementalTableReader,
    run_micro_batches,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("v", T.LongType()),
])


def _write_json(dirpath: str, name: str, ids: list[int]) -> str:
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for i in ids:
            f.write(json.dumps({"id": i, "v": i * 2}) + "\n")
    return p


def test_filestream_wal_replays_planned_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    _write_json(landing, "b.json", [1, 2])
    _write_json(landing, "c.json", [3])
    cp = str(tmp_path / "cp.json")

    src = FileStreamSource(spark, landing, cp, fmt="json", schema=SCHEMA)
    b0 = src.next_batch()
    assert sorted(os.path.basename(p) for p in b0.files) == ["b.json", "c.json"]
    # crash before commit; a new file arrives that sorts FIRST
    _write_json(landing, "a.json", [4])

    healed = FileStreamSource(spark, landing, cp, fmt="json", schema=SCHEMA)
    b0_again = healed.next_batch()
    assert b0_again.batch_id == b0.batch_id
    assert b0_again.files == b0.files  # NOT re-listed: a.json excluded
    healed.commit(b0_again)
    b1 = healed.next_batch()
    assert [os.path.basename(p) for p in b1.files] == ["a.json"]


def test_copy_into_crash_then_new_files_no_loss_no_dups(spark, tmp_path):
    landing = str(tmp_path / "landing")
    _write_json(landing, "f1.json", [1, 2, 3])
    _write_json(landing, "f2.json", [4, 5])
    t = Table.create(spark, str(tmp_path / "tbl"), SCHEMA,
                     PartitionSpec.unpartitioned())
    res = copy_into(t, landing, file_format="json", schema=SCHEMA)
    assert (res.batches, res.rows) == (1, 5)

    # simulate the crash: the engine commits the batch to the TABLE but dies
    # before the checkpoint advances. Reconstruct the source exactly as
    # copy_into does (same checkpoint path => same WAL).
    import hashlib
    src_key = hashlib.sha1(
        f"{os.path.abspath(landing)}|json|".encode()).hexdigest()[:16]
    cp = os.path.join(t.location, "metadata", "copy-into", src_key)
    _write_json(landing, "f3.json", [6, 7])
    fss = FileStreamSource(spark, landing, cp, fmt="json", schema=SCHEMA)
    batch = fss.next_batch()
    t.append(batch.df, summary_extra={
        "copy-into-batch": f"{src_key}:{batch.batch_id}"})
    # crash here (no fss.commit); another file lands before the re-run
    _write_json(landing, "f4.json", [8])

    res2 = copy_into(t, landing, file_format="json", schema=SCHEMA)
    assert res2.skipped_batches == 1  # healed the crashed batch
    assert res2.batches == 1          # and ingested f4 as its own batch
    rows = t.scan().select("id").collect()
    assert sorted(r.id for r in rows) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_table_reader_wal_pins_snapshot_span(spark, tmp_path):
    src_t = Table.create(spark, str(tmp_path / "src"), SCHEMA,
                         PartitionSpec.unpartitioned())
    dst = Table.create(spark, str(tmp_path / "dst"), SCHEMA,
                       PartitionSpec.unpartitioned())
    mk = lambda ids: spark.createDataFrame([(i, i * 2) for i in ids], SCHEMA)
    src_t.append(mk([1, 2]))
    cp = str(tmp_path / "cp.json")

    reader = IncrementalTableReader(src_t, cp)
    b0 = reader.next_batch()
    dst.append(b0.df, summary_extra={"batch-id": b0.batch_id})
    # crash before reader.commit; the SOURCE advances meanwhile
    src_t.append(mk([3, 4, 5]))

    healed = IncrementalTableReader(Table.load(spark, src_t.location), cp)
    n = run_micro_batches(healed, dst)
    # heal skipped batch 0 (already applied), then batch 1 = exactly the new
    # files — nothing lost, nothing duplicated
    assert n == 1
    rows = dst.scan().select("id").collect()
    assert sorted(r.id for r in rows) == [1, 2, 3, 4, 5]


def test_change_feed_reader_wal_replays_span(spark, tmp_path):
    src_t = Table.create(
        spark, str(tmp_path / "src"), SCHEMA, PartitionSpec.unpartitioned(),
        properties={"write.change-data-feed.enabled": "true"})
    mk = lambda ids: spark.createDataFrame([(i, i * 2) for i in ids], SCHEMA)
    src_t.append(mk([1, 2]))
    cp = str(tmp_path / "cp.json")

    reader = ChangeFeedReader(src_t, cp)
    b0 = reader.next_batch()
    n0 = b0.df.count()
    # crash before commit; source advances
    src_t.append(mk([3]))

    healed = ChangeFeedReader(Table.load(spark, src_t.location), cp)
    b0_again = healed.next_batch()
    assert b0_again.batch_id == b0.batch_id
    assert b0_again.df.count() == n0  # pinned span: the new append excluded
    healed.commit(b0_again)
    b1 = healed.next_batch()
    assert b1 is not None and b1.df.count() == 1
