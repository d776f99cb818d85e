"""Change data feed: row-level CDC across append/delete/update/merge commits,
write-time change files, and loud failure when CDC was never recorded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import PartitionSpec, days
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.change_feed import change_feed
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import DeleteJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.merge import MergeIntoJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.update import UpdateJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


@pytest.fixture()
def cdf_table(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "cdf"),
        T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={
            "write.target-file-size-bytes": str(256 * 1024),
            "write.change-data-feed.enabled": "true",
        },
    )
    df = generate_transcripts(spark, n_convs=25, hot_convs=1, hot_turns=30,
                              span_days=2).cache()
    t.append(df, n_files=3)
    return t, df


def _rows(df, cols=("conv_id", "turn_idx", "role", "text", "tool", "ts")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_append_inserts_come_from_added_files(cdf_table):
    t, df = cdf_table
    feed = change_feed(t, None)
    assert feed.select("_change_type").distinct().collect()[0][0] == "insert"
    assert _rows(feed) == _rows(df)
    assert feed.select("_commit_snapshot_id").distinct().count() == 1


@pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
def test_delete_records_victims(cdf_table, mode):
    t, df = cdf_table
    s0 = t.current_snapshot().snapshot_id
    DeleteJob(t, [("role", "=", "tool"), ("turn_idx", "<", 5)], mode=mode).run()
    feed = change_feed(t, s0)
    assert feed.select("_change_type").distinct().collect()[0][0] == "delete"
    expect = df.filter((F.col("role") == "tool") & (F.col("turn_idx") < 5))
    assert _rows(feed) == _rows(expect)
    # a second overlapping delete only records NEWLY deleted rows
    s1 = t.current_snapshot().snapshot_id
    DeleteJob(t, [("turn_idx", "<", 5)], mode=mode).run()
    feed2 = change_feed(t, s1)
    expect2 = df.filter((F.col("turn_idx") < 5) & (F.col("role") != "tool"))
    assert _rows(feed2) == _rows(expect2)


def test_update_records_pre_and_post_images(cdf_table):
    t, df = cdf_table
    s0 = t.current_snapshot().snapshot_id
    UpdateJob(t, [("role", "=", "assistant")],
              {"text": "concat('v2:', text)"}).run()
    feed = change_feed(t, s0)
    n = df.filter(F.col("role") == "assistant").count()
    by_type = dict(feed.groupBy("_change_type").count().collect())
    assert by_type == {"update_preimage": n, "update_postimage": n}
    pre = feed.filter(F.col("_change_type") == "update_preimage")
    post = feed.filter(F.col("_change_type") == "update_postimage")
    assert _rows(pre) == _rows(df.filter(F.col("role") == "assistant"))
    assert post.filter(~F.col("text").startswith("v2:")).count() == 0


def test_merge_records_all_three_types(cdf_table):
    t, df = cdf_table
    s0 = t.current_snapshot().snapshot_id
    updates = df.filter(F.col("turn_idx") % 4 == 0).withColumn(
        "text", F.concat(F.lit("fixed:"), F.col("text")))
    inserts = df.filter(F.col("turn_idx") % 7 == 1).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("-x")))
    res = MergeIntoJob(t).run(updates.unionByName(inserts))
    feed = change_feed(t, s0)
    by_type = dict(feed.groupBy("_change_type").count().collect())
    assert by_type["update_preimage"] == by_type["update_postimage"] == res.rows_updated
    assert by_type["insert"] == res.rows_inserted
    ins = feed.filter(F.col("_change_type") == "insert")
    assert _rows(ins) == _rows(inserts)


def test_compaction_emits_no_changes(cdf_table):
    t, df = cdf_table
    t.append(df, n_files=3)
    s = t.current_snapshot().snapshot_id
    CompactionJob(t).run()
    assert change_feed(t, s).count() == 0


def test_feed_spans_multiple_commits_in_order(cdf_table):
    t, df = cdf_table
    s0 = t.current_snapshot().snapshot_id
    DeleteJob(t, [("turn_idx", "<", 2)]).run()
    t.append(df.filter(F.col("turn_idx") < 2), n_files=1)
    feed = change_feed(t, s0)
    by_type = dict(feed.groupBy("_change_type").count().collect())
    n = df.filter(F.col("turn_idx") < 2).count()
    assert by_type == {"delete": n, "insert": n}
    # the two slices carry their own commit ids, in snapshot order
    ids = [r[0] for r in feed.select("_commit_snapshot_id").distinct()
           .orderBy("_commit_snapshot_id").collect()]
    assert len(ids) == 2 and ids[0] < ids[1]


def test_unrecorded_row_change_fails_loudly(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "nocdf"),
        T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(),
    )
    df = generate_transcripts(spark, n_convs=10, hot_convs=1, hot_turns=10,
                              span_days=1)
    t.append(df, n_files=1)
    s0 = t.current_snapshot().snapshot_id
    DeleteJob(t, [("turn_idx", "<", 3)]).run()
    with pytest.raises(ValueError, match="change-data-feed"):
        change_feed(t, s0)


def test_change_feed_reader_streams_cdc_batches(cdf_table, tmp_path):
    """ChangeFeedReader: checkpointed micro-batches of row-level changes —
    the streaming face of the same feed."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.streaming.incremental import ChangeFeedReader

    t, df = cdf_table
    r = ChangeFeedReader(t, str(tmp_path / "cp"))
    b0 = r.next_batch()
    assert b0 is not None
    assert _rows(b0.df) == _rows(df)  # initial load = all inserts
    r.commit(b0)
    assert r.next_batch() is None  # caught up

    DeleteJob(t, [("turn_idx", "<", 2)]).run()
    t.append(df.filter(F.col("turn_idx") == 0), n_files=1)
    b1 = r.next_batch()
    by_type = dict(b1.df.groupBy("_change_type").count().collect())
    assert by_type["delete"] == df.filter(F.col("turn_idx") < 2).count()
    assert by_type["insert"] == df.filter(F.col("turn_idx") == 0).count()
    r.commit(b1)
    assert r.next_batch() is None


def test_table_changes_sql(spark, tmp_path):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql

    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_database("ops")
    t = c.create_table(
        "ops.t", T.StructType.fromDDL(SCHEMA_DDL), PartitionSpec.of(),
        properties={"write.change-data-feed.enabled": "true"},
    )
    df = generate_transcripts(spark, n_convs=10, hot_convs=1, hot_turns=10,
                              span_days=1)
    t.append(df, n_files=1)
    s0 = t.current_snapshot().snapshot_id
    run_sql(c, "DELETE FROM ops.t WHERE turn_idx >= 5")
    feed = run_sql(c, f"TABLE CHANGES ops.t FROM VERSION {s0}")
    assert dict(feed.groupBy("_change_type").count().collect()) == {
        "delete": df.filter(F.col("turn_idx") >= 5).count()
    }


def test_eqdel_commit_reconstructed_as_keyed_deletes(cdf_table):
    """Equality deletes need no write-time change files: the feed reads the
    eqdel key parquet and emits NULL-padded delete rows (keys only)."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import (
        equality_delete,
    )
    t, df = cdf_table
    s0 = t.current_snapshot().snapshot_id
    victims = sorted({r["conv_id"] for r in
                      df.select("conv_id").limit(2).collect()})
    keys = t.spark.createDataFrame([(v,) for v in victims], "conv_id string")
    equality_delete(t, keys)
    feed = change_feed(t, s0)
    rows = feed.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["conv_id"] for r in rows) == victims
    assert all(r["text"] is None and r["turn_idx"] is None for r in rows)


def test_upsert_commit_reconstructed_as_delete_plus_insert(cdf_table):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.upsert import upsert

    t, df = cdf_table
    s0 = t.current_snapshot().snapshot_id
    batch = (df.filter(F.col("turn_idx") == 0).limit(3)
             .withColumn("text", F.lit("rewritten")))
    upsert(t, batch, key_columns=["conv_id", "turn_idx"])
    feed = change_feed(t, s0)
    by_type = dict(feed.groupBy("_change_type").count().collect())
    n = batch.count()
    assert by_type == {"delete": n, "insert": n}
    ins = feed.filter(F.col("_change_type") == "insert")
    assert sorted(r["text"] for r in ins.collect()) == ["rewritten"] * n
    # works with CDF property off too: reconstruction needs no change files
    t.meta.properties.pop("write.change-data-feed.enabled")
    assert change_feed(t, s0).count() == 2 * n


def test_branch_commits_never_leak_into_main_feed_or_time_travel(cdf_table):
    """An abandoned branch's rows must not surface on main — neither via
    TABLE CHANGES nor FOR TIMESTAMP AS OF — even though its snapshots live
    in the same log (resolution walks main's ancestry)."""
    t, df = cdf_table
    s0 = t.current_snapshot().snapshot_id
    t.create_branch("audit")
    extra = df.limit(5).withColumn("conv_id", F.concat(F.lit("br-"),
                                                       F.col("conv_id")))
    t.append_to_branch("audit", extra, n_files=1)
    # feed over main sees nothing from the branch
    assert change_feed(t, s0).count() == 0
    # timestamp travel to "now" resolves to main's head, not the branch tip
    import time
    s = t.snapshot_as_of(int(time.time() * 1000) + 10_000)
    assert s.snapshot_id == s0
    assert t.scan(snapshot_id=s.snapshot_id).filter(
        F.col("conv_id").startswith("br-")).count() == 0
    # after fast-forward the branch commit joins main's ancestry
    t.fast_forward_main("audit")
    feed = change_feed(t, s0)
    assert feed.count() == 5
    assert {r["_change_type"] for r in feed.collect()} == {"insert"}


def test_feed_rejects_non_ancestor_from(cdf_table):
    t, df = cdf_table
    t.create_branch("side")
    br = t.append_to_branch("side", df.limit(2), n_files=1)
    with pytest.raises(ValueError, match="not an ancestor"):
        change_feed(t, br.snapshot_id)


def test_clone_initial_rows_feed_as_inserts(cdf_table, tmp_path):
    """A clone's first snapshot populates the table: table_changes from the
    table start reports those rows as inserts at the clone commit (Delta's
    behavior for a cloned table's version 0), not a loud failure."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.clone import clone_table

    t, df = cdf_table
    c = clone_table(t, str(tmp_path / "c"))
    feed = change_feed(c, None, None)
    by_type = dict(feed.groupBy("_change_type").count().collect())
    assert by_type == {"insert": df.count()}
    assert _rows(feed) == _rows(t.scan())
