"""Table clones (SHALLOW/DEEP, point-in-time) and COPY INTO batch ingestion.

Reference parity: the blueprint's Databricks platform provides both as
managed operations (clones for dev/test forks, COPY INTO as Auto Loader's
batch sibling over the same landing dirs the pipelines read,
`transformations/pipelines/bronze_ocsf_iam_sources_dlt.py`)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.clone import clone_table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.copy_into import (
    copy_into,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import DeleteJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql


def _rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in df.select("conv_id", "turn_idx", "text").collect()
    )


@pytest.fixture()
def src(spark, tmp_path):
    tbl = Table.create(
        spark, str(tmp_path / "src"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
    )
    tbl.append(generate_transcripts(spark, n_convs=30, hot_convs=0,
                                    span_days=2), n_files=2)
    return tbl


# ---------------------------------------------------------------- clones

def test_shallow_clone_matches_source_scan(spark, src, tmp_path):
    c = clone_table(src, str(tmp_path / "c"))
    assert _rows(c.scan()) == _rows(src.scan())
    s = c.current_snapshot()
    assert s.operation == "clone"
    assert s.summary["clone-depth"] == "shallow"
    # pure metadata: no bytes under the clone's data dir
    assert not os.path.isdir(os.path.join(c.location, "data")) or not any(
        fs for _r, _d, fs in os.walk(os.path.join(c.location, "data")))


def test_shallow_clone_copy_on_write_isolation(spark, src, tmp_path):
    c = clone_table(src, str(tmp_path / "c"))
    before_src, before_clone = _rows(src.scan()), _rows(c.scan())
    # write to the clone: source unchanged
    extra = generate_transcripts(spark, n_convs=3, hot_convs=0, span_days=1) \
        .withColumn("conv_id", F.concat(F.lit("clone-"), "conv_id"))
    c.append(extra, n_files=1)
    assert _rows(src.scan()) == before_src
    after_append = _rows(c.scan())
    assert len(after_append) == len(before_clone) + extra.count()
    # rewrite rows in the SOURCE (copy-on-write delete): clone pinned
    DeleteJob(src, [("role", "=", "tool")]).run()
    assert _rows(c.scan()) == after_append
    # clone-side GC never deletes source-owned files
    c.expire_snapshots(keep_last=1)
    src.refresh()
    assert _rows(c.scan()) == after_append


def test_deep_clone_copies_bytes_and_survives_source_purge(spark, src, tmp_path):
    c = clone_table(src, str(tmp_path / "c"), deep=True)
    want = _rows(src.scan())
    assert _rows(c.scan()) == want
    data_root = os.path.join(c.location, "data")
    for f in c.live_data_files():
        assert f.path.startswith(data_root)
    # nuke every source data file: deep clone still reads
    for f in src.live_data_files():
        os.remove(f.path)
    assert _rows(c.scan()) == want
    assert c.current_snapshot().summary["clone-depth"] == "deep"


def test_deep_clone_remaps_positional_delete_paths(spark, src, tmp_path):
    src.set_property("write.delete.mode", "merge-on-read")
    DeleteJob(src, [("role", "=", "tool")], mode="merge-on-read").run()
    assert any(f.content == "posdel" for f in src._live_files(None, None))
    c = clone_table(src, str(tmp_path / "c"), deep=True)
    want = _rows(src.scan())
    for f in src._live_files(None, None):
        os.remove(f.path)
    assert _rows(c.scan()) == want  # posdel file_path remapped to clone paths


def test_clone_point_in_time_version_and_tag(spark, src, tmp_path):
    v1 = src.current_snapshot().snapshot_id
    src.create_tag("v1")
    src.append(generate_transcripts(spark, n_convs=5, hot_convs=0,
                                    span_days=1), n_files=1)
    by_ver = clone_table(src, str(tmp_path / "cv"), snapshot_id=v1)
    by_tag = clone_table(src, str(tmp_path / "ct"), ref="v1")
    assert _rows(by_ver.scan()) == _rows(by_tag.scan())
    assert by_ver.scan().count() < src.scan().count()
    with pytest.raises(ValueError):
        clone_table(src, str(tmp_path / "cx"), snapshot_id=v1, ref="v1")


def test_post_clone_equality_delete_outranks_cloned_rows(spark, src, tmp_path):
    """Sequence invariant: the clone's first commit takes max(cloned seqs),
    so a post-clone equality delete applies to every cloned row."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import (
        equality_delete,
    )

    c = clone_table(src, str(tmp_path / "c"))
    victim = c.scan().select("conv_id").first().conv_id
    keys = spark.createDataFrame([(victim,)], "conv_id string")
    equality_delete(c, keys)
    assert c.scan().filter(F.col("conv_id") == victim).count() == 0


def test_sql_clone_statements(spark, src, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_sql(cat, "CREATE DATABASE db")
    t = cat.create_table("db.base", src.schema)
    t.append(generate_transcripts(spark, n_convs=8, hot_convs=0, span_days=1),
             n_files=1)
    v1 = t.current_snapshot().snapshot_id
    t.append(generate_transcripts(spark, n_convs=4, hot_convs=0, span_days=1),
             n_files=1)
    sc = run_sql(cat, "CREATE TABLE db.fork SHALLOW CLONE db.base")
    assert sc.scan().count() == t.scan().count()
    dc = run_sql(cat, f"CREATE TABLE db.pin DEEP CLONE db.base VERSION AS OF {v1}")
    assert dc.scan().count() < t.scan().count()
    # IF NOT EXISTS: second run is a no-op returning the existing table
    again = run_sql(cat, "CREATE TABLE IF NOT EXISTS db.fork SHALLOW CLONE db.base")
    assert again.location == sc.location


# ------------------------------------------------------------- COPY INTO

def _land(spark, path, tag, n_convs=6, parts=2):
    df = generate_transcripts(spark, n_convs=n_convs, hot_convs=0, span_days=1) \
        .withColumn("conv_id", F.concat(F.lit(tag + "-"), "conv_id"))
    df.repartition(parts).write.mode("append").parquet(path)
    return df.count()


@pytest.fixture()
def target(spark, tmp_path):
    return Table.create(
        spark, str(tmp_path / "tgt"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
    )


def test_copy_into_idempotent_and_incremental(spark, target, tmp_path):
    land = str(tmp_path / "landing")
    n1 = _land(spark, land, "a")
    r1 = copy_into(target, land)
    assert r1.rows == n1 and r1.batches == 1 and r1.skipped_batches == 0
    assert target.scan().count() == n1
    # re-run: no new files, no new snapshot
    sid = target.current_snapshot().snapshot_id
    r2 = copy_into(target, land)
    assert r2.batches == 0 and r2.rows == 0
    assert target.current_snapshot().snapshot_id == sid
    # drop new files in: exactly those load
    n2 = _land(spark, land, "b")
    r3 = copy_into(target, land)
    assert r3.rows == n2 and target.scan().count() == n1 + n2


def test_copy_into_heals_commit_without_checkpoint(spark, target, tmp_path):
    """Crash between table commit and checkpoint advance: the marker in the
    snapshot log makes the re-run skip the batch instead of double-loading."""
    import shutil

    land = str(tmp_path / "landing")
    n1 = _land(spark, land, "a")
    copy_into(target, land)
    # simulate the crash: roll the checkpoint back (commit already landed)
    shutil.rmtree(os.path.join(target.location, "metadata", "copy-into"))
    r = copy_into(target, land)
    assert r.skipped_batches >= 1 and r.rows == 0
    assert target.scan().count() == n1  # exactly once


def test_copy_into_pattern_and_batching(spark, target, tmp_path):
    land = str(tmp_path / "landing")
    _land(spark, os.path.join(land, "keep"), "k", parts=3)
    _land(spark, os.path.join(land, "skip"), "s", parts=2)
    r = copy_into(target, land, pattern="keep/*.parquet",
                  max_files_per_batch=1)
    assert r.batches >= 3  # one file per commit
    got = {row.conv_id.split("-")[0] for row in target.scan().collect()}
    assert got == {"k"}


def test_sql_copy_into(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_sql(cat, "CREATE DATABASE db")
    cat.create_table("db.t", T.StructType.fromDDL(SCHEMA_DDL))
    land = str(tmp_path / "landing")
    n = _land(spark, land, "x")
    res = run_sql(cat, f"COPY INTO db.t FROM '{land}' FILEFORMAT = PARQUET")
    assert res.rows == n
    res2 = run_sql(cat, f"COPY INTO db.t FROM '{land}'")
    assert res2.rows == 0  # idempotent across invocations
