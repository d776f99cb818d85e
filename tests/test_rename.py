"""ALTER TABLE RENAME COLUMN — metadata-only rename across file eras.

Covers the third leg of schema evolution (add/drop/rename). Invariants:
values survive unchanged under the new name (per-turn text equality),
pre-rename files keep pruning on their old-era stats, equality deletes
keyed on a prior name keep applying, and maintenance rewrites migrate
files to the current name as they touch them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql


def transcripts_schema():
    return T.StructType.fromDDL(SCHEMA_DDL)


def default_spec():
    return PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 4))


@pytest.fixture()
def small_df(spark):
    return generate_transcripts(spark, n_convs=30, hot_convs=1, hot_turns=40).cache()


def rows(df, order=("conv_id", "turn_idx")):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_rename_preserves_values_across_eras(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df, n_files=2)
    before = rows(t.scan().select("conv_id", "turn_idx", "text"))

    t.rename_column("text", "content")
    assert [f.name for f in t.schema.fields].count("content") == 1
    assert "text" not in {f.name for f in t.schema.fields}
    # old-era files surface their values under the new name
    after = rows(t.scan().select("conv_id", "turn_idx", "content"))
    assert after == before

    # post-rename append mixes eras in one scan
    extra = small_df.withColumnRenamed("text", "content") \
                    .withColumn("content", F.concat(F.lit("new:"), F.col("content"))) \
                    .withColumn("conv_id", F.concat(F.lit("x-"), F.col("conv_id")))
    t.append(extra, n_files=1)
    got = rows(t.scan().select("conv_id", "turn_idx", "content"))
    want = sorted(before + [(f"x-{c}", i, f"new:{x}") for c, i, x in before])
    assert got == want


def test_rename_chain_and_rename_back(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df, n_files=1)
    base = rows(t.scan().select("conv_id", "turn_idx", "text"))

    t.rename_column("text", "body")
    t.append(small_df.withColumnRenamed("text", "body")
             .withColumn("conv_id", F.concat(F.lit("b-"), F.col("conv_id"))),
             n_files=1)
    t.rename_column("body", "content")  # chain: text -> body -> content
    got = rows(t.scan().select("conv_id", "turn_idx", "content"))
    assert len(got) == 2 * len(base)
    assert all(x is not None for _, _, x in got)

    # rename back to a historical name: content -> text
    t.rename_column("content", "text")
    got2 = rows(t.scan().select("conv_id", "turn_idx", "text"))
    assert got2 == got
    # the reverted name left its own history (no self-alias)
    assert "text" not in t.rename_map().get("text", [])


def test_rename_keeps_pruning_on_old_files(spark, tmp_table_dir, small_df):
    t = Table.create(
        spark, tmp_table_dir, transcripts_schema(), default_spec(),
        properties={"stats.columns": "conv_id,turn_idx,role,tool,ts"})
    t.append(small_df, n_files=3)
    conv = small_df.select("conv_id").orderBy("conv_id").first()[0]
    t.rename_column("conv_id", "conversation_id")

    n_all = len(t.live_data_files())
    pruned = t.plan_scan([("conversation_id", "=", conv)])
    # old-era bounds (recorded under conv_id) still prune under the new name
    assert 0 < len(pruned) < n_all
    got = t.scan([("conversation_id", "=", conv)]).count()
    want = small_df.filter(F.col("conv_id") == conv).count()
    assert got == want


def test_eqdel_keyed_on_old_name_applies_after_rename(spark, tmp_table_dir, small_df):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import equality_delete

    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df, n_files=1)
    conv = small_df.select("conv_id").orderBy("conv_id").first()[0]
    keys = spark.createDataFrame([(conv,)], "conv_id string")
    equality_delete(t, keys)
    t.rename_column("conv_id", "conversation_id")
    got = t.scan()
    assert got.filter(F.col("conversation_id") == conv).count() == 0
    assert got.count() == small_df.filter(F.col("conv_id") != conv).count()


def test_compaction_migrates_files_to_new_name(spark, tmp_table_dir, small_df):
    # unpartitioned so all 4 small files land in one FFD plan deterministically
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), PartitionSpec.of())
    t.append(small_df, n_files=4)
    before = rows(t.scan().select("conv_id", "turn_idx", "text"))
    t.rename_column("text", "content")
    res = CompactionJob(t, target_file_size=1 << 30).run()
    assert res.files_in == 4 and res.files_out >= 1
    # rewritten files carry the new physical name: their stats exist under it
    for f in t.live_data_files():
        assert "content" in f.null_counts or "content" in f.lower_bounds
    after = rows(t.scan().select("conv_id", "turn_idx", "content"))
    assert after == before


def test_rename_partition_source_updates_spec(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df, n_files=1)
    t.rename_column("ts", "event_time")
    assert {f.source for f in t.spec.fields} == {"event_time", "conv_id"}
    # post-rename append computes partition values from the new source name
    t.append(small_df.withColumnRenamed("ts", "event_time")
             .withColumn("conv_id", F.concat(F.lit("y-"), F.col("conv_id"))),
             n_files=1)
    assert t.scan().count() == 2 * small_df.count()
    day = small_df.select(F.date_format("ts", "yyyy-MM-dd")).orderBy(
        "date_format(ts, yyyy-MM-dd)").first()[0]
    n = t.scan([("event_time", ">=", f"{day} 00:00:00")]).count()
    assert n > 0


def test_rename_travels_with_cluster_keys_and_stats_props(spark, tmp_table_dir, small_df):
    t = Table.create(
        spark, tmp_table_dir, transcripts_schema(), default_spec(),
        properties={"stats.columns": "conv_id,turn_idx",
                    "stats.bloom-columns": "conv_id"})
    t.append(small_df, n_files=1)
    t.set_cluster_keys(["conv_id", "turn_idx"])
    t.rename_column("conv_id", "cid")
    assert t.meta.cluster_keys == ["cid", "turn_idx"]
    assert t.stat_columns() == ["cid", "turn_idx"]
    assert t.bloom_stat_columns() == ["cid"]


def test_rename_rejections(spark, tmp_table_dir, small_df):
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df, n_files=1)
    with pytest.raises(ValueError, match="unknown column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("text", "role")

    t.rename_column("tool", "tool_name")
    # historical names stay reserved: add/append/rename-into all reject
    with pytest.raises(ValueError, match="historical name"):
        t.add_columns([T.StructField("tool", T.StringType())])
    with pytest.raises(ValueError, match="pre-rename"):
        t.append(small_df)  # still carries the old 'tool' column
    with pytest.raises(ValueError, match="historical name"):
        t.rename_column("role", "tool")

    # a CHECK constraint referencing the column blocks the rename
    t.set_property("constraints.check.text_nonempty", "length(text) > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column("text", "content")


def test_sql_rename_column(spark, tmp_path, small_df):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_sql(cat, "CREATE DATABASE db")
    run_sql(cat, "CREATE TABLE db.t (conv_id STRING, turn_idx INT, role STRING, "
                 "text STRING, tool STRING, ts TIMESTAMP)")
    t = cat.load_table("db.t")
    t.append(small_df, n_files=1)
    run_sql(cat, "ALTER TABLE db.t RENAME COLUMN text TO content")
    t2 = cat.load_table("db.t")
    assert "content" in {f.name for f in t2.schema.fields}
    got = run_sql(cat, "SELECT conv_id, turn_idx, content FROM db.t "
                       "WHERE content IS NOT NULL").count()
    assert got == small_df.count()


def test_dropped_names_never_reusable(spark, tmp_table_dir, small_df):
    """DROP COLUMN leaves the column's bytes in existing files; re-introducing
    the name (or any historical physical name it once carried) via ADD COLUMNS
    or RENAME would make the pinned-schema scan resurrect those stale bytes in
    place of NULLs — silent corruption, so every such ghost name is reserved
    forever in `schema.dropped-names`."""
    t = Table.create(spark, tmp_table_dir, transcripts_schema(), default_spec())
    t.append(small_df, n_files=1)

    t.rename_column("tool", "tool_name")
    t.drop_column("tool_name")
    # the drop retires the rename-history entry into the ghost set: both the
    # final name and the original physical name are rejected everywhere
    for ghost in ("tool_name", "tool"):
        with pytest.raises(ValueError, match="DROPPED"):
            t.add_columns([T.StructField(ghost, T.StringType())])
        with pytest.raises(ValueError, match="DROPPED"):
            t.rename_column("role", ghost)

    # ghosts accumulate across drops rather than replacing each other
    t.drop_column("text")
    with pytest.raises(ValueError, match="DROPPED"):
        t.add_columns([T.StructField("text", T.StringType())])
    with pytest.raises(ValueError, match="DROPPED"):
        t.add_columns([T.StructField("tool", T.StringType())])

    # a fresh name is fine — and reads as NULL on old-era files, which is
    # exactly the behavior reusing a ghost name could not deliver
    t.add_columns([T.StructField("tool_v2", T.StringType())])
    assert t.scan().where(F.col("tool_v2").isNotNull()).count() == 0
    assert t.scan().count() == small_df.count()


def test_drop_unpurged_renamed_table_releases_conventional_dir(
        spark, tmp_path, small_df):
    """DROP TABLE (purge=False) on a renamed-away table removes only the
    metadata tree; the shadow on its conventional dir must clear anyway —
    leftover data files are unreferenced by any future manifests, so the
    original name can reclaim its conventional location instead of
    allocating __uuid sibling dirs forever."""
    import os

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("default.a", T.StructType.fromDDL(SCHEMA_DDL))
    t.append(small_df, n_files=1)
    conv_dir = cat._conventional_loc("default.a")
    cat.rename_table("default.a", "default.b")
    cat.drop_table("default.b", purge=False)
    assert os.path.isdir(conv_dir), "unpurged data files should remain"
    assert conv_dir not in cat._mapping()["shadowed"], \
        "shadow must clear once no table metadata lives there"
    t2 = cat.create_table("default.a", T.StructType.fromDDL(SCHEMA_DDL))
    assert os.path.abspath(t2.location) == os.path.abspath(conv_dir)
    t2.append(small_df, n_files=1)
    assert cat.load_table("default.a").scan().count() == small_df.count()


def test_failed_create_leaves_no_dangling_mapping(spark, tmp_path, small_df):
    """A create that fails after a non-conventional location was allocated
    must prune its mapping entry from _catalog.json."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("default.a", T.StructType.fromDDL(SCHEMA_DDL))
    t.append(small_df, n_files=1)
    cat.rename_table("default.a", "default.b")  # shadows default.a's dir
    with pytest.raises(Exception):
        cat.create_table("default.a", "not-a-schema")  # type: ignore[arg-type]
    assert "default.a" not in cat._mapping()["locations"], \
        "failed create must not leave a dangling locations entry"
    # and a subsequent good create works normally
    cat.create_table("default.a", T.StructType.fromDDL(SCHEMA_DDL))
    assert cat.table_exists("default.a")
