"""Maintenance SQL dialect: every supported statement dispatches to the right
job/DDL with the right arguments, and unsupported text fails loudly."""

from __future__ import annotations

import datetime

import pytest
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


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_database("ops")
    t = c.create_table(
        "ops.transcripts", T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"write.target-file-size-bytes": str(256 * 1024)},
    )
    df = generate_transcripts(spark, n_convs=30, hot_convs=1, hot_turns=40,
                              span_days=3).cache()
    t.append(df, n_files=3)
    t.append(df.withColumn("conv_id", F.concat("conv_id", F.lit("-b"))), n_files=3)
    return c, df


def _rows(t):
    return sorted(tuple(r) for r in t.scan().collect())


def test_optimize_compacts(cat):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    before_rows, before_files = _rows(t), len(t.live_data_files())
    res = run_sql(c, "OPTIMIZE ops.transcripts")
    t.refresh()
    assert res.files_out < res.files_in
    assert len(t.live_data_files()) < before_files
    assert _rows(t) == before_rows


def test_optimize_zorder_by(cat):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    before = _rows(t)
    res = run_sql(c, "OPTIMIZE ops.transcripts ZORDER BY (conv_id, turn_idx, ts)")
    t.refresh()
    assert res.curve == "zorder"
    assert _rows(t) == before


def test_vacuum_retain_hours(cat, tmp_path):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    run_sql(c, "OPTIMIZE ops.transcripts")
    run_sql(c, "OPTIMIZE ops.transcripts ZORDER BY (conv_id)")
    # Delta retention-duration check: a sub-minimum RETAIN is refused until
    # the table opts out (in-flight readers may still reference the files)
    with pytest.raises(ValueError, match="below the minimum retention"):
        run_sql(c, "VACUUM ops.transcripts RETAIN 0 HOURS")
    t.set_property("vacuum.retention-check.enabled", "false")
    res = run_sql(c, "VACUUM ops.transcripts RETAIN 0 HOURS")
    assert res.expired_snapshot_ids
    t.refresh()
    assert len(t.snapshots) <= 4  # keep_last(3) + expire marker


def test_vacuum_default_retention_protects_fresh_orphans(cat, tmp_path):
    import os

    c, _ = cat
    t = c.load_table("ops.transcripts")
    # a freshly-written uncommitted file (simulated crashed writer) survives
    # a default VACUUM: its mtime is inside the 168h retention window
    stray = os.path.join(t.location, "data", "stray-inflight.parquet")
    os.makedirs(os.path.dirname(stray), exist_ok=True)
    with open(stray, "wb") as f:
        f.write(b"PAR1crashed-writer-bytesPAR1")
    run_sql(c, "VACUUM ops.transcripts")
    assert os.path.exists(stray)
    # lowering the floor via the property makes the same statement delete it
    t.set_property("vacuum.min-retention-hours", "0")
    run_sql(c, "VACUUM ops.transcripts")
    assert not os.path.exists(stray)


def test_restore_version_and_timestamp(cat):
    c, df = cat
    t = c.load_table("ops.transcripts")
    s1 = t.snapshots[0]
    n1 = t.scan(snapshot_id=s1.snapshot_id).count()
    run_sql(c, f"RESTORE TABLE ops.transcripts TO VERSION AS OF {s1.snapshot_id}")
    t.refresh()
    assert t.scan().count() == n1
    # roll forward again via timestamp of the second (larger) snapshot
    s2 = t.snapshots[1]
    iso = datetime.datetime.fromtimestamp(
        s2.timestamp_ms / 1000.0, tz=datetime.timezone.utc
    ).isoformat()
    run_sql(c, f"RESTORE TABLE ops.transcripts TO TIMESTAMP AS OF '{iso}'")
    t.refresh()
    assert t.scan().count() == 2 * n1


def test_describe_history(cat):
    c, _ = cat
    hist = run_sql(c, "DESCRIBE HISTORY ops.transcripts")
    rows = hist.collect()
    assert [r.operation for r in rows] == ["append", "append"]
    assert rows[0].version > rows[1].version  # newest first
    assert rows[0].summary["added-data-files"]


def test_alter_cluster_by_and_properties(cat):
    c, _ = cat
    run_sql(c, "ALTER TABLE ops.transcripts CLUSTER BY (conv_id, ts)")
    run_sql(c, "ALTER TABLE ops.transcripts SET TBLPROPERTIES "
               "('stats.columns'='conv_id,ts', 'a.b'='1')")
    t = c.load_table("ops.transcripts")
    assert t.meta.cluster_keys == ["conv_id", "ts"]
    assert t.meta.properties["a.b"] == "1"
    assert t.stat_columns() == ["conv_id", "ts"]


def test_alter_partitioned_by_evolves_spec(cat):
    c, _ = cat
    run_sql(c, "ALTER TABLE ops.transcripts PARTITIONED BY "
               "(days(ts) AS ts_day, bucket(4, conv_id) AS conv_b4)")
    t = c.load_table("ops.transcripts")
    assert [f.name for f in t.spec.fields] == ["ts_day", "conv_b4"]
    assert t.spec.fields[1].transform == "bucket[4]"
    # name reuse with a different definition still rejected through SQL
    with pytest.raises(ValueError, match="incomparable"):
        run_sql(c, "ALTER TABLE ops.transcripts PARTITIONED BY "
                   "(bucket(8, conv_id) AS conv_b4)")


def test_delete_from_where(cat):
    c, df = cat
    t = c.load_table("ops.transcripts")
    total = t.scan().count()
    gone = t.scan().filter(
        (F.col("role") == "tool") & (F.col("turn_idx") >= 2)
    ).count()
    res = run_sql(
        c, "DELETE FROM ops.transcripts WHERE role = 'tool' AND turn_idx >= 2")
    assert res.rows_deleted == gone
    t.refresh()
    assert t.scan().count() == total - gone
    assert t.current_snapshot().operation == "delete"


def test_delete_from_where_timestamp_literal(cat):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    cutoff = datetime.datetime(2025, 1, 2)
    keep = t.scan().filter(~(F.col("ts") < F.lit(cutoff))).count()
    run_sql(c, "DELETE FROM ops.transcripts WHERE ts < TIMESTAMP '2025-01-02 00:00:00'")
    t.refresh()
    assert t.scan().count() == keep


def test_delete_from_where_in_and_null(cat):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    keep = t.scan().filter(
        ~F.col("role").isin("system", "tool") | F.col("role").isNull()
    ).count()
    run_sql(c, "DELETE FROM ops.transcripts WHERE role IN ('system', 'tool')")
    t.refresh()
    assert t.scan().count() == keep
    n_null_tool = t.scan().filter(F.col("tool").isNull()).count()
    run_sql(c, "DELETE FROM ops.transcripts WHERE tool IS NULL")
    t.refresh()
    assert t.scan().filter(F.col("tool").isNull()).count() == 0
    assert n_null_tool > 0


def test_update_set_where(cat):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    n_assist = t.scan().filter(F.col("role") == "assistant").count()
    res = run_sql(
        c, "UPDATE ops.transcripts SET text = concat('v2:', text), "
           "tool = 'rewriter' WHERE role = 'assistant'")
    assert res.rows_updated == n_assist
    t.refresh()
    got = t.scan().filter(F.col("role") == "assistant")
    assert got.filter(F.col("text").startswith("v2:")).count() == n_assist
    assert got.filter(F.col("tool") == "rewriter").count() == n_assist


def test_update_without_where_touches_all(cat):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    total = t.scan().count()
    res = run_sql(c, "UPDATE ops.transcripts SET tool = coalesce(tool, 'none')")
    assert res.rows_updated == total
    t.refresh()
    assert t.scan().filter(F.col("tool").isNull()).count() == 0


def test_unsupported_statement_raises(cat):
    c, _ = cat
    with pytest.raises(ValueError, match="unsupported"):
        run_sql(c, "TRUNCATE TABLE ops.transcripts")
    with pytest.raises(ValueError, match="unparseable"):
        run_sql(c, "ALTER TABLE ops.transcripts PARTITIONED BY (years(ts))")


def test_maintain_runs_managed_pass(cat):
    """MAINTAIN: compacts, clusters only when keys are set and data is new,
    expires by retention properties — one policy call, three ledgered jobs."""
    c, df = cat
    t = c.load_table("ops.transcripts")
    run_sql(c, "ALTER TABLE ops.transcripts CLUSTER BY (conv_id)")
    run_sql(c, "ALTER TABLE ops.transcripts SET TBLPROPERTIES "
               "('maintenance.expire.keep-last'='1', "
               "'maintenance.expire.grace-sec'='0')")
    before = _rows(t)
    res = run_sql(c, "MAINTAIN ops.transcripts")
    # cluster keys set -> clustering IS the compactor (no separate packer)
    assert res.compaction is None
    assert res.clustering is not None and res.clustering.curve == "zorder"
    assert res.expiration is not None and res.expiration.expired_snapshot_ids
    t.refresh()
    assert _rows(t) == before  # scan equivalence through the managed pass
    # steady state: a second pass finds no changed partitions -> no rewrite
    res2 = run_sql(c, "MAINTAIN ops.transcripts")
    assert res2.clustering is None
    # new data arrives -> the next pass re-clusters only what changed
    t.append(df.limit(50), n_files=1)
    res3 = run_sql(c, "MAINTAIN ops.transcripts")
    assert res3.clustering is not None
    assert res3.clustering.partitions > 0
    t.refresh()
    total_parts = len({tuple(sorted(f.partition.items()))
                       for f in t.live_data_files()})
    assert res3.clustering.partitions <= total_parts


def test_maintain_without_cluster_keys_compacts(cat):
    c, df = cat
    t = c.load_table("ops.transcripts")
    before = _rows(t)
    res = run_sql(c, "MAINTAIN ops.transcripts")
    assert res.clustering is None
    assert res.compaction is not None and res.compaction.files_in > res.compaction.files_out
    t.refresh()
    assert _rows(t) == before


def test_create_database_table_show_describe(spark, tmp_path):
    """Catalog DDL statements (reference pre/post_setup_ocsf_tables.py):
    CREATE DATABASE / CREATE TABLE with partition transforms and properties /
    SHOW TABLES / DESCRIBE DETAIL."""
    c = Catalog(spark, str(tmp_path / "wh2"))
    run_sql(c, "CREATE DATABASE IF NOT EXISTS audit")
    t = run_sql(
        c,
        "CREATE TABLE audit.events (conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp) "
        "PARTITIONED BY (days(ts) AS ts_day, bucket(4, conv_id)) "
        "TBLPROPERTIES ('write.target-file-size-bytes'='1048576')")
    assert [f.name for f in t.spec.fields] == ["ts_day", "conv_id_bucket"]
    assert t.meta.properties["write.target-file-size-bytes"] == "1048576"
    assert run_sql(c, "SHOW TABLES IN audit") == ["events"]
    # IF NOT EXISTS short-circuits instead of failing
    again = run_sql(c, "CREATE TABLE IF NOT EXISTS audit.events (x int)")
    assert [f.name for f in again.schema.fields] != ["x"]
    df = generate_transcripts(spark, n_convs=5, hot_convs=0, span_days=1)
    t.append(df, n_files=1)
    detail = run_sql(c, "DESCRIBE DETAIL audit.events")
    assert detail["record_count"] == df.count()
    assert detail["file_count"] >= 1


def test_branch_tag_statements(cat, spark):
    """ALTER TABLE CREATE/DROP BRANCH|TAG, FAST FORWARD TO, DESCRIBE REFS."""
    c, df = cat
    t = c.load_table("ops.transcripts")
    n0 = t.scan().count()
    run_sql(c, "ALTER TABLE ops.transcripts CREATE TAG v1")
    run_sql(c, "ALTER TABLE ops.transcripts CREATE BRANCH dev")
    refs = {r["name"]: (r["type"], r["snapshot_id"])
            for r in run_sql(c, "DESCRIBE REFS ops.transcripts").collect()}
    assert refs["v1"][0] == "tag" and refs["dev"][0] == "branch"
    assert refs["main"][1] == refs["dev"][1]

    extra = df.limit(50).withColumn("conv_id", F.concat(F.lit("x-"), "conv_id"))
    t.refresh()
    t.append_to_branch("dev", extra, n_files=1)
    assert t.scan().count() == n0
    run_sql(c, "ALTER TABLE ops.transcripts FAST FORWARD TO dev")
    t.refresh()
    assert t.scan().count() == n0 + extra.count()
    assert t.scan(ref="v1").count() == n0  # tag still frozen
    run_sql(c, "ALTER TABLE ops.transcripts DROP TAG v1")
    t.refresh()
    assert "v1" not in t.refs


def test_delete_by_keys_equality(cat):
    c, df = cat
    t = c.load_table("ops.transcripts")
    total = t.scan().count()
    victim = df.select("conv_id").first()["conv_id"]
    gone = t.scan().filter(F.col("conv_id") == victim).count()
    t.scan().select("conv_id").filter(F.col("conv_id") == victim) \
        .distinct().createOrReplaceTempView("eq_victims")
    res = run_sql(
        c, "DELETE FROM ops.transcripts BY KEYS (SELECT conv_id FROM eq_victims)")
    assert res.mode == "equality"
    t.refresh()
    assert t.scan().count() == total - gone
    assert t.current_snapshot().operation == "delete"
    assert len(t.live_eq_delete_files()) == 1


def test_upsert_into_by_keys(cat):
    c, df = cat
    t = c.load_table("ops.transcripts")
    total = t.scan().count()
    t.scan().filter(F.col("turn_idx") == 1) \
        .withColumn("text", F.concat(F.lit("sqlup:"), F.col("text"))) \
        .createOrReplaceTempView("upsert_batch")
    res = run_sql(
        c, "UPSERT INTO ops.transcripts BY KEYS (conv_id, turn_idx) "
           "FROM (SELECT * FROM upsert_batch)")
    assert res.rows_appended > 0
    t.refresh()
    assert t.scan().count() == total  # pure replacement, no growth
    got = t.scan().filter(F.col("turn_idx") == 1).select("text").collect()
    assert all(r["text"].startswith("sqlup:") for r in got)
    assert t.current_snapshot().operation == "upsert"


def test_merge_into_statement(cat):
    """MERGE INTO ... WHEN MATCHED THEN UPDATE SET * / DELETE
    [WHEN NOT MATCHED THEN INSERT *] — the Databricks upsert statement,
    dispatched to MergeIntoJob."""
    c, df = cat
    t = c.load_table("ops.transcripts")
    n0 = t.scan().count()

    upd = (t.scan().filter(F.col("turn_idx") == 0)
           .withColumn("text", F.lit("merged")))
    ins = df.filter(F.col("turn_idx") == 1).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("-x")))
    upd.unionByName(ins).cache().createOrReplaceTempView("src")
    res = run_sql(c, """
        MERGE INTO ops.transcripts AS t USING src AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert res.rows_updated == upd.count()
    assert res.rows_inserted == ins.count()
    t.refresh()
    assert t.scan().count() == n0 + ins.count()
    assert t.scan().filter(
        (F.col("turn_idx") == 0) & (F.col("text") != "merged")).count() == 0

    # USING (subquery) + WHEN MATCHED THEN DELETE, no insert clause
    run_sql(c, """
        MERGE INTO ops.transcripts USING (
            SELECT * FROM src WHERE turn_idx = 0
        ) ON conv_id = conv_id AND turn_idx = turn_idx
        WHEN MATCHED THEN DELETE
    """)
    t.refresh()
    assert t.scan().filter(F.col("turn_idx") == 0).count() == 0

    # malformed ON (non-equi) fails loudly
    import pytest
    with pytest.raises(ValueError, match="MERGE ON"):
        run_sql(c, """
            MERGE INTO ops.transcripts USING src
            ON t.conv_id = s.other_col
            WHEN MATCHED THEN UPDATE SET *
        """)


def test_optimize_where_scopes_partitions(cat):
    """OPTIMIZE ... WHERE compacts only the partitions the predicate's
    pruned file set touches; other partitions' files are untouched."""
    import os

    c, df = cat
    t = c.load_table("ops.transcripts")
    days_ = sorted({str(r[0]) for r in
                    t.scan().selectExpr("CAST(ts AS DATE)").distinct().collect()})
    target_day = days_[0]
    before = {f.path: f.partition for f in t.live_data_files()}
    rows_before = _rows(t)
    run_sql(c, f"OPTIMIZE ops.transcripts WHERE ts < TIMESTAMP '{days_[1]}T00:00:00'")
    t.refresh()
    after = {f.path: f.partition for f in t.live_data_files()}
    # untouched partitions keep their exact files
    for p, part in before.items():
        if part.get("ts_day") != target_day:
            assert p in after, f"cold partition file rewritten: {part}"
    # the targeted partition was compacted (file set changed)
    tgt_before = [p for p, part in before.items() if part.get("ts_day") == target_day]
    tgt_after = [p for p, part in after.items() if part.get("ts_day") == target_day]
    assert set(tgt_before) != set(tgt_after)
    assert len(tgt_after) < len(tgt_before)
    assert _rows(t) == rows_before  # rows byte-identical


def test_explain_estimate_statement(cat):
    c, df = cat
    res = run_sql(c, "EXPLAIN ESTIMATE ops.transcripts")
    assert res["files_after_pruning"] == res["files_total"]
    assert res["estimated_rows"] is None  # no ANALYZE yet
    run_sql(c, "ANALYZE TABLE ops.transcripts COMPUTE STATISTICS")
    total = c.load_table("ops.transcripts").scan().count()
    res = run_sql(c, "EXPLAIN ESTIMATE ops.transcripts")
    assert abs(res["estimated_rows"] - total) / total < 0.05
    conv = df.select("conv_id").first()["conv_id"]
    res2 = run_sql(c, f"EXPLAIN ESTIMATE ops.transcripts WHERE conv_id = '{conv}'")
    assert res2["estimated_rows"] < res["estimated_rows"]
    assert res2["suggested_shuffle_partitions"] >= 1
    # the self-tuning MERGE decision is observable (VERDICT r4 item #7):
    # before a frequency ANALYZE there is no salt plan; after one, the plan
    # reports the triggering top_count and the derived bucket count (None
    # here — the test table is unskewed, so the planner declines to salt),
    # plus the broadcast-vs-shuffle call for the pruned key projection
    assert res["merge_salt_plan"] == {}
    run_sql(c, "ANALYZE TABLE ops.transcripts COMPUTE STATISTICS "
               "FOR FREQUENCY COLUMNS (conv_id)")
    res3 = run_sql(c, "EXPLAIN ESTIMATE ops.transcripts")
    plan = res3["merge_salt_plan"]["conv_id"]
    assert plan["top_count"] >= 1
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.plans.costs import (
        suggest_salt_buckets,
    )
    assert plan["salt_buckets"] == suggest_salt_buckets(
        c.load_table("ops.transcripts"), "conv_id")
    assert isinstance(res3["merge_target_key_broadcast"], bool)


def test_insert_into_ctas_drop_table(cat):
    c, df = cat
    t = c.load_table("ops.transcripts")
    n0 = t.scan().count()
    t.scan().limit(7).createOrReplaceTempView("seven")
    res = run_sql(c, "INSERT INTO ops.transcripts SELECT * FROM seven")
    assert res.summary["added-records"] == 7
    t.refresh()
    assert t.scan().count() == n0 + 7

    # CTAS with partitioning + properties
    t2 = run_sql(c, """
        CREATE TABLE ops.assistant_turns
        PARTITIONED BY (days(ts) AS ts_day)
        TBLPROPERTIES ('write.target-file-size-bytes'='262144')
        AS SELECT conv_id, turn_idx, text, ts FROM seven WHERE turn_idx >= 0
    """)
    assert [f.name for f in t2.spec.fields] == ["ts_day"]
    assert t2.meta.properties["write.target-file-size-bytes"] == "262144"
    assert t2.scan().count() == 7
    assert "assistant_turns" in run_sql(c, "SHOW TABLES IN ops")
    # idempotent under IF NOT EXISTS
    t3 = run_sql(c, "CREATE TABLE IF NOT EXISTS ops.assistant_turns "
                    "AS SELECT * FROM seven")
    assert t3.scan().count() == 7

    run_sql(c, "DROP TABLE ops.assistant_turns")
    assert "assistant_turns" not in run_sql(c, "SHOW TABLES IN ops")
    run_sql(c, "DROP TABLE IF EXISTS ops.assistant_turns")  # no-op, no raise
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown table"):
        run_sql(c, "DROP TABLE ops.assistant_turns")


def test_select_statement(cat):
    """SELECT over catalog tables: scan resolution, WHERE pushdown path,
    aggregation, CTE, and a two-table JOIN."""
    c, df = cat
    t = c.load_table("ops.transcripts")
    total = t.scan().count()

    out = run_sql(c, "SELECT * FROM ops.transcripts")
    assert out.count() == total

    conv = df.select("conv_id").first()["conv_id"]
    out = run_sql(
        c, f"SELECT conv_id, turn_idx FROM ops.transcripts "
           f"WHERE conv_id = '{conv}' AND turn_idx >= 2 ORDER BY turn_idx")
    rows = out.collect()
    assert rows and all(r.conv_id == conv and r.turn_idx >= 2 for r in rows)

    agg = run_sql(c, "SELECT role, COUNT(*) AS n FROM ops.transcripts "
                     "GROUP BY role ORDER BY n DESC").collect()
    assert sum(r.n for r in agg) == total

    cte = run_sql(c, """
        WITH lasts AS (
          SELECT conv_id, MAX(turn_idx) AS last_turn
          FROM ops.transcripts GROUP BY conv_id
        )
        SELECT COUNT(*) AS n FROM lasts
    """).collect()
    assert cte[0].n == t.scan().select("conv_id").distinct().count()

    # self-join through two catalog references
    j = run_sql(c, """
        SELECT a.conv_id, COUNT(*) AS n
        FROM ops.transcripts a
        JOIN ops.transcripts b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
        GROUP BY a.conv_id
    """)
    assert j.agg(F.sum("n")).first()[0] == total


def test_select_time_travel_and_insert_from_table(cat):
    c, df = cat
    t = c.load_table("ops.transcripts")
    v1 = t.meta.current_snapshot_id
    n1 = t.scan().count()
    t.append(df.withColumn("conv_id", F.concat("conv_id", F.lit("-c"))))
    t.refresh()
    assert t.scan().count() > n1

    out = run_sql(c, f"SELECT * FROM ops.transcripts VERSION AS OF {v1}")
    assert out.count() == n1

    ts = datetime.datetime.fromtimestamp(
        t.meta.snapshot_by_id(v1).timestamp_ms / 1000,
        tz=datetime.timezone.utc).isoformat()
    out = run_sql(c, f"SELECT * FROM ops.transcripts TIMESTAMP AS OF '{ts}'")
    assert out.count() == n1

    run_sql(c, "ALTER TABLE ops.transcripts CREATE TAG stable "
               f"AS OF VERSION {v1}")
    out = run_sql(c, "SELECT * FROM ops.transcripts AT TAG stable")
    assert out.count() == n1

    # INSERT INTO ... SELECT straight from another catalog-table state
    t2 = run_sql(c, "CREATE TABLE ops.replay AS "
                    f"SELECT * FROM ops.transcripts VERSION AS OF {v1}")
    assert t2.scan().count() == n1
    run_sql(c, "INSERT INTO ops.replay "
               "SELECT * FROM ops.transcripts AT TAG stable LIMIT 5")
    t2.refresh()
    assert t2.scan().count() == n1 + 5
    run_sql(c, "DROP TABLE ops.replay")


def test_select_pushdown_prunes_files(cat, monkeypatch):
    """The single-table WHERE path hands pruning predicates to Table.scan —
    observe plan_scan receiving them and returning fewer files."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table

    c, df = cat
    t = c.load_table("ops.transcripts")
    run_sql(c, "OPTIMIZE ops.transcripts")  # partition-clustered layout
    seen = {}
    orig = Table.plan_scan

    def spy(self, predicates=None, snapshot_id=None):
        files = orig(self, predicates, snapshot_id)
        if predicates:
            seen["preds"] = predicates
            seen["files"] = len(files)
            seen["total"] = len(orig(self, None, snapshot_id))
        return files

    monkeypatch.setattr(Table, "plan_scan", spy)
    day = df.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).first()["d"]
    out = run_sql(
        c, "SELECT COUNT(*) AS n FROM ops.transcripts "
           f"WHERE ts < TIMESTAMP '{day}T00:00:00' AND lower(role) <> 'x'")
    n = out.first()["n"]
    oracle = t.scan().filter(f"ts < '{day} 00:00:00'").count()
    assert n == oracle
    assert seen["preds"] == [("ts", "<", datetime.datetime.fromisoformat(
        f"{day}T00:00:00"))]
    assert seen["files"] < seen["total"]

    # OR disables pushdown entirely (subset-of-conjuncts would be unsound)
    seen.clear()
    out = run_sql(c, "SELECT COUNT(*) AS n FROM ops.transcripts "
                     f"WHERE ts < TIMESTAMP '{day}T00:00:00' OR role = 'user'")
    assert "preds" not in seen
    assert out.first()["n"] == t.scan().filter(
        f"ts < '{day} 00:00:00' OR role = 'user'").count()


def test_select_pushdown_not_group_claims_nothing(cat, monkeypatch):
    """``NOT (a AND b AND c)`` must not leak its inner conjuncts as pruning
    predicates: a paren-blind AND-split once yielded the clean middle term
    ``turn_idx = 0`` — pruning on it drops files full of rows the NOT-group
    KEEPS (silent loss). The group must stay one (unparseable) term."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import (
        _select_pushdown, _split_on_and)

    # splitter: NOT-group survives whole; trailing conjunct still splits off
    body = "NOT (conv_id = 'x' AND turn_idx = 0 AND role = 'user') AND ts IS NOT NULL"
    assert _split_on_and(body) == [
        "NOT (conv_id = 'x' AND turn_idx = 0 AND role = 'user')",
        "ts IS NOT NULL",
    ]

    c, df = cat
    t = c.load_table("ops.transcripts")
    run_sql(c, "OPTIMIZE ops.transcripts ZORDER BY (conv_id, turn_idx, ts)")
    stmt = ("SELECT COUNT(*) AS n FROM ops.transcripts "
            "WHERE NOT (conv_id = 'x' AND turn_idx = 0 AND role = 'user')")
    assert _select_pushdown(stmt, t) is None

    seen = {}
    orig = Table.plan_scan

    def spy(self, predicates=None, snapshot_id=None):
        if predicates:
            seen["preds"] = predicates
        return orig(self, predicates, snapshot_id)

    monkeypatch.setattr(Table, "plan_scan", spy)
    out = run_sql(c, stmt)
    assert "preds" not in seen
    assert out.first()["n"] == t.scan().filter(
        "NOT (conv_id = 'x' AND turn_idx = 0 AND role = 'user')").count()


def test_alter_add_columns_null_fills_old_files(cat):
    """ADD COLUMNS is metadata-only: pre-evolution files surface the new
    columns as NULL (scans pin the table schema), post-evolution appends
    carry values, and the union scans coherently."""
    c, df = cat
    t = c.load_table("ops.transcripts")
    n_before = t.scan().count()
    run_sql(c, "ALTER TABLE ops.transcripts ADD COLUMNS (score DOUBLE, lang STRING)")
    t.refresh()
    assert [f.name for f in t.schema.fields][-2:] == ["score", "lang"]
    # old rows: NULL in both new columns, same row count
    got = t.scan()
    assert got.count() == n_before
    assert got.filter(F.col("score").isNotNull()).count() == 0
    # new append with values lands next to the old files
    newdf = (df.limit(50)
             .withColumn("conv_id", F.concat("conv_id", F.lit("-ev")))
             .withColumn("score", F.lit(0.5))
             .withColumn("lang", F.lit("en")))
    t.append(newdf, n_files=1)
    assert t.scan().filter(F.col("lang") == "en").count() == 50
    assert t.scan().count() == n_before + 50
    # duplicate / partition-collision rejections
    with pytest.raises(ValueError, match="already exists"):
        run_sql(c, "ALTER TABLE ops.transcripts ADD COLUMNS (score DOUBLE)")
    with pytest.raises(ValueError, match="partition field"):
        run_sql(c, "ALTER TABLE ops.transcripts ADD COLUMNS (ts_day STRING)")


def test_alter_drop_column_projects_immediately(cat):
    """DROP COLUMN removes the column from every scan without touching data
    files; guarded while the partition spec or a constraint still needs it."""
    c, df = cat
    t = c.load_table("ops.transcripts")
    files_before = sorted(f.path for f in t.live_data_files())
    run_sql(c, "ALTER TABLE ops.transcripts DROP COLUMN tool")
    t.refresh()
    assert "tool" not in [f.name for f in t.schema.fields]
    assert "tool" not in t.scan().columns
    # zero data movement
    assert sorted(f.path for f in t.live_data_files()) == files_before
    # guards
    with pytest.raises(ValueError, match="partition source"):
        run_sql(c, "ALTER TABLE ops.transcripts DROP COLUMN ts")
    run_sql(c, "ALTER TABLE ops.transcripts ADD CONSTRAINT roleset "
               "CHECK (role IN ('user','assistant','system','tool'))")
    with pytest.raises(ValueError, match="CHECK constraint"):
        run_sql(c, "ALTER TABLE ops.transcripts DROP COLUMN role")
    with pytest.raises(ValueError, match="unknown column"):
        run_sql(c, "ALTER TABLE ops.transcripts DROP COLUMN nope")


def test_maintenance_after_schema_evolution(cat):
    """Compaction after ADD COLUMNS must fold the null-filled columns into
    the rewritten files (they carry the evolved schema) and preserve every
    pre-evolution row byte-for-byte on the surviving columns."""
    c, df = cat
    t = c.load_table("ops.transcripts")
    before = sorted(
        tuple(r) for r in t.scan(columns=["conv_id", "turn_idx", "text"]).collect())
    run_sql(c, "ALTER TABLE ops.transcripts ADD COLUMNS (score DOUBLE)")
    run_sql(c, "OPTIMIZE ops.transcripts")
    t.refresh()
    after = sorted(
        tuple(r) for r in t.scan(columns=["conv_id", "turn_idx", "text"]).collect())
    assert after == before
    assert t.scan().filter(F.col("score").isNotNull()).count() == 0


def test_show_create_table_round_trips(cat):
    """SHOW CREATE TABLE emits DDL the module's own grammar re-executes:
    a table rebuilt from the emitted statements matches the original's
    schema, partition transforms, user properties, and cluster keys."""
    c, _ = cat
    run_sql(c, "ALTER TABLE ops.transcripts CLUSTER BY (conv_id, turn_idx)")
    run_sql(c, "ALTER TABLE ops.transcripts SET TBLPROPERTIES "
               "('stats.columns'='conv_id,turn_idx,ts')")
    stmt = run_sql(c, "SHOW CREATE TABLE ops.transcripts").first()["createtab_stmt"]
    rebuilt = stmt.replace("ops.transcripts", "ops.rebuilt")
    for s in rebuilt.split(";\n"):
        run_sql(c, s)
    a, b = c.load_table("ops.transcripts"), c.load_table("ops.rebuilt")
    assert b.schema == a.schema
    assert [f.to_dict() for f in b.spec.fields] == [f.to_dict() for f in a.spec.fields]
    assert b.meta.cluster_keys == a.meta.cluster_keys
    assert b.meta.properties.get("stats.columns") == "conv_id,turn_idx,ts"
    assert (b.meta.properties.get("write.target-file-size-bytes")
            == a.meta.properties.get("write.target-file-size-bytes"))


def test_show_create_table_excludes_internal_bookkeeping(cat):
    c, _ = cat
    run_sql(c, "ALTER TABLE ops.transcripts RENAME COLUMN tool TO tool_name")
    stmt = run_sql(c, "SHOW CREATE TABLE ops.transcripts").first()["createtab_stmt"]
    assert "tool_name" in stmt and "schema.renames" not in stmt


def test_create_and_refresh_materialized_view(cat):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    t.set_property("write.change-data-feed.enabled", "true")
    mv = run_sql(c, """
        CREATE MATERIALIZED VIEW ops.role_stats AS
        SELECT role, count(*) AS n_rows, sum(turn_idx) AS sum_turn,
               min(ts) AS first_ts, avg(turn_idx) AS avg_turn
        FROM ops.transcripts
        WHERE turn_idx >= 1
        GROUP BY role""")
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.matview import (
        read_view,
    )

    def expected():
        return sorted(
            tuple(r) for r in
            t.refresh().scan().filter("turn_idx >= 1").groupBy("role").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("turn_idx").alias("sum_turn"),
                F.min("ts").alias("first_ts"),
                F.avg("turn_idx").alias("avg_turn"),
            ).collect())

    def got():
        return sorted(tuple(r) for r in
                      read_view(c.load_table("ops.role_stats")).collect())

    assert got() == expected()
    # source changes -> REFRESH statement catches the view up incrementally
    run_sql(c, "DELETE FROM ops.transcripts WHERE turn_idx < 2")
    res = run_sql(c, "REFRESH MATERIALIZED VIEW ops.role_stats")
    assert res.mode == "incremental"
    assert got() == expected()
    res = run_sql(c, "REFRESH MATERIALIZED VIEW ops.role_stats FULL")
    assert res.mode == "full"
    assert got() == expected()
    # IF NOT EXISTS short-circuits; the view shows in the catalog
    run_sql(c, "CREATE MATERIALIZED VIEW IF NOT EXISTS ops.role_stats AS "
               "SELECT role, count(*) AS n FROM ops.transcripts GROUP BY role")
    assert "role_stats" in run_sql(c, "SHOW TABLES IN ops")


def test_matview_sql_rejects_bad_select_items(cat):
    c, _ = cat
    with pytest.raises(ValueError, match="neither an aggregate"):
        run_sql(c, "CREATE MATERIALIZED VIEW ops.bad AS "
                   "SELECT role, tool, count(*) AS n "
                   "FROM ops.transcripts GROUP BY role")
    with pytest.raises(ValueError, match="select items"):
        run_sql(c, "CREATE MATERIALIZED VIEW ops.bad AS "
                   "SELECT role, count(*) "
                   "FROM ops.transcripts GROUP BY role")


def _merge_fixture(cat):
    """(catalog, table, base df) with CDF on and a deterministic source view."""
    c, df = cat
    t = c.load_table("ops.transcripts")
    t.set_property("write.change-data-feed.enabled", "true")
    return c, t, df


def test_merge_per_column_set(cat):
    c, t, df = _merge_fixture(cat)
    before = {(r["conv_id"], r["turn_idx"]): (r["text"], r["tool"])
              for r in t.scan().collect()}
    src = df.filter(F.col("turn_idx") % 5 == 0).select(
        "conv_id", "turn_idx", F.lit("patched").alias("text"),
        F.lit("sqltool").alias("tool"))
    src.createOrReplaceTempView("patch_src")
    run_sql(c, """
        MERGE INTO ops.transcripts AS t USING patch_src AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED THEN UPDATE SET text = concat(s.text, ':', t.text),
                                     tool = s.tool
    """)
    after = {(r["conv_id"], r["turn_idx"]): (r["text"], r["tool"], r["role"])
             for r in t.refresh().scan().collect()}
    assert len(after) == len(before)
    matched = unmatched = 0
    for k, (text, tool, _role) in after.items():
        if k[1] % 5 == 0 and not k[0].endswith("-b"):   # keys in the source
            matched += 1
            assert text == "patched:" + before[k][0]   # t./s. both visible
            assert tool == "sqltool"
        else:
            unmatched += 1
            assert (text, tool) == before[k]           # untouched columns
    assert matched and unmatched


def test_merge_matched_and_condition_keeps_unmet_rows(cat):
    c, t, df = _merge_fixture(cat)
    before = {(r["conv_id"], r["turn_idx"]): r["text"]
              for r in t.scan().collect()}
    df.filter(F.col("turn_idx") < 4).select(
        "conv_id", "turn_idx", "role", F.lit("cond").alias("text"),
        "tool", "ts").createOrReplaceTempView("cond_src")
    res = run_sql(c, """
        MERGE INTO ops.transcripts AS t USING cond_src AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND t.role = 'user' THEN UPDATE SET *
    """)
    after = {(r["conv_id"], r["turn_idx"]): (r["text"], r["role"])
             for r in t.refresh().scan().collect()}
    assert len(after) == len(before)
    changed = sum(1 for k, (text, role) in after.items()
                  if text == "cond" and role == "user")
    assert changed == res.rows_updated > 0
    for k, (text, role) in after.items():
        if role != "user" or k[1] >= 4:
            assert text == before[k]                   # unmet rows verbatim


def test_merge_not_matched_condition_filters_inserts(cat):
    c, t, df = _merge_fixture(cat)
    n_before = t.scan().count()
    df.filter(F.col("turn_idx") < 2).select(
        F.concat("conv_id", F.lit("-new")).alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    ).createOrReplaceTempView("ins_src")
    res = run_sql(c, """
        MERGE INTO ops.transcripts AS t USING ins_src AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN NOT MATCHED AND s.role = 'assistant' THEN INSERT *
    """)
    t.refresh()
    inserted = t.scan().filter(F.col("conv_id").endswith("-new"))
    assert inserted.count() == res.rows_inserted > 0
    assert {r["role"] for r in inserted.collect()} == {"assistant"}
    # matched rows untouched by the insert-only merge
    assert t.scan().count() == n_before + res.rows_inserted


def test_merge_delete_with_condition(cat):
    c, t, df = _merge_fixture(cat)
    df.filter(F.col("turn_idx") < 4).select("conv_id", "turn_idx", "role") \
        .createOrReplaceTempView("del_src")
    res = run_sql(c, """
        MERGE INTO ops.transcripts AS t USING del_src AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND t.role = 'tool' THEN DELETE
    """)
    t.refresh()
    survivors = t.scan().filter(
        (F.col("turn_idx") < 4) & (F.col("role") == "tool")
        & ~F.col("conv_id").endswith("-b"))         # -b keys not in source
    assert survivors.count() == 0
    assert res.rows_deleted > 0
    assert t.scan().filter((F.col("turn_idx") < 4)
                           & (F.col("role") != "tool")).count() > 0


def test_merge_extended_writes_change_feed(cat):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.change_feed import (
        change_feed,
    )

    c, t, df = _merge_fixture(cat)
    from_snap = t.current_snapshot().snapshot_id
    df.filter(F.col("turn_idx") < 2).select("conv_id", "turn_idx") \
        .withColumn("role", F.lit("x")).createOrReplaceTempView("cdf_src")
    run_sql(c, """
        MERGE INTO ops.transcripts AS t USING cdf_src AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND t.role = 'user' THEN UPDATE SET text = 'cdfpatch'
    """)
    feed = change_feed(t.refresh(), from_snap)
    by_type = {r["_change_type"]: r["n"] for r in
               feed.groupBy("_change_type").count()
               .withColumnRenamed("count", "n").collect()}
    assert by_type.get("update_preimage", 0) == by_type.get(
        "update_postimage", 0) > 0
    pre = feed.filter("_change_type = 'update_preimage'")
    assert {r["role"] for r in pre.select("role").distinct().collect()} \
        == {"user"}  # ONLY condition-met rows have change records


def test_rename_table_is_catalog_metadata_only(cat):
    c, df = cat
    t = c.load_table("ops.transcripts")
    rows, loc = _rows(t), t.location
    run_sql(c, "ALTER TABLE ops.transcripts RENAME TO ops.conversations")
    # old name gone, new name resolves to the SAME physical location
    assert not c.table_exists("ops.transcripts")
    assert c.table_exists("ops.conversations")
    renamed = c.load_table("ops.conversations")
    assert renamed.location == loc  # zero bytes moved
    assert _rows(renamed) == rows
    assert c.list_tables("ops") == ["conversations"]
    with pytest.raises(ValueError, match="unknown table"):
        c.load_table("ops.transcripts").scan()
    # the renamed table keeps working end to end (write + maintenance)
    renamed.append(df.limit(10), n_files=1)
    run_sql(c, "OPTIMIZE ops.conversations")
    assert renamed.refresh().scan().count() == len(rows) + 10


def test_recreate_old_name_after_rename_never_collides(cat):
    c, df = cat
    run_sql(c, "ALTER TABLE ops.transcripts RENAME TO ops.conversations")
    # re-creating the OLD name must not touch the renamed table's bytes
    run_sql(c, "CREATE TABLE ops.transcripts (conv_id STRING, turn_idx INT, "
               "role STRING, text STRING, tool STRING, ts TIMESTAMP)")
    fresh = c.load_table("ops.transcripts")
    renamed = c.load_table("ops.conversations")
    assert fresh.location != renamed.location
    assert fresh.scan().count() == 0
    assert renamed.scan().count() > 0
    assert sorted(c.list_tables("ops")) == ["conversations", "transcripts"]
    # rename chains: a mapped name renames again without breaking resolution
    run_sql(c, "ALTER TABLE ops.conversations RENAME TO ops.archive")
    assert c.load_table("ops.archive").scan().count() > 0
    assert not c.table_exists("ops.conversations")
    with pytest.raises(ValueError, match="already exists"):
        run_sql(c, "ALTER TABLE ops.archive RENAME TO ops.transcripts")
    # dropping the renamed table purges its (shadowed) physical dir
    c.drop_table("ops.archive")
    assert sorted(c.list_tables("ops")) == ["transcripts"]


def test_show_tblproperties(cat):
    c, _ = cat
    t = c.load_table("ops.transcripts")
    t.set_property("custom.owner", "ops-team")
    props = run_sql(c, "SHOW TBLPROPERTIES ops.transcripts")
    assert props["custom.owner"] == "ops-team"
    assert props["write.target-file-size-bytes"] == str(256 * 1024)
    one = run_sql(c, "SHOW TBLPROPERTIES ops.transcripts ('custom.owner')")
    assert one == {"custom.owner": "ops-team"}
    with pytest.raises(ValueError, match="not set"):
        run_sql(c, "SHOW TBLPROPERTIES ops.transcripts ('nope')")
