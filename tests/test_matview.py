"""Incrementally-maintained materialized views (operators/matview.py): the
refresh invariant — after ANY committed source change and a refresh, the view
equals a from-scratch aggregate of the source's current state — plus the
incremental-path mechanics (arithmetic vs dirty-group recompute, eqdel
derivation, exactly-once pointers, full-refresh fallback)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.catalog import Catalog
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import (
    DeleteJob, equality_delete,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.matview import (
    Agg, MatViewDefn, create_materialized_view, full_state,
    last_refresh_snapshot, read_view, refresh, user_columns,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.update import UpdateJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.upsert import upsert
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)

DEFN = MatViewDefn(
    group_keys=("role",),
    aggs=(
        Agg("count_star", None, "n_rows"),
        Agg("count", "tool", "n_tool"),
        Agg("sum", "turn_idx", "sum_turn"),
        Agg("min", "ts", "first_ts"),
        Agg("max", "ts", "last_ts"),
        Agg("avg", "turn_idx", "avg_turn"),
    ),
)


@pytest.fixture()
def base(spark):
    return generate_transcripts(
        spark, n_convs=40, hot_convs=2, span_days=3, seed=91).cache()


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def make_source(cat, base, name="default.src", cdf=True):
    props = {"write.target-file-size-bytes": str(512 * 1024),
             "stats.columns": "conv_id,turn_idx,role,tool,ts"}
    if cdf:
        props["write.change-data-feed.enabled"] = "true"
    t = cat.create_table(
        name, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts"), bucket("cb", "conv_id", 2)),
        properties=props)
    t.append(base, n_files=2, sort_within=("conv_id", "turn_idx"))
    return t.refresh()


def canon(df, defn):
    out = []
    for r in df.select(*user_columns(defn)).collect():
        vals = []
        for c in user_columns(defn):
            v = r[c]
            vals.append(round(v, 9) if isinstance(v, float) else v)
        out.append(tuple(vals))
    return sorted(out, key=str)


def assert_view_current(mv, src, defn=DEFN):
    df = src.refresh().scan()
    if defn.filter:
        df = df.filter(defn.filter)
    expected = full_state(df, defn)
    assert canon(read_view(mv.refresh()), defn) == canon(expected, defn)


def test_create_populates_initial_state(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv", "default.src", DEFN)
    assert_view_current(mv, src)
    assert last_refresh_snapshot(mv) == src.refresh().current_snapshot().snapshot_id


def test_append_refreshes_incrementally(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv", "default.src", DEFN)
    extra = base.filter(F.col("turn_idx") < 2).withColumn(
        "role", F.lit("auditor"))
    src.append(extra, n_files=1)
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_view_current(mv, src)
    # second refresh with no source change is a no-op commit-wise
    n = len(mv.refresh().snapshots)
    assert refresh(mv).mode == "noop"
    assert len(mv.refresh().snapshots) == n


def test_cow_delete_arithmetic_and_dirty(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv", "default.src", DEFN)
    # interior delete (not all of any role): counts/sums change arithmetically,
    # min ts per role is likely touched for some group -> dirty recompute path
    DeleteJob(src, [("turn_idx", "<", 2)]).run()
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_view_current(mv, src)


def test_group_death_removes_row(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv", "default.src", DEFN)
    DeleteJob(src, [("role", "=", "tool")]).run()
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_view_current(mv, src)
    roles = {r["role"] for r in read_view(mv.refresh()).collect()}
    assert "tool" not in roles


def test_update_pre_post_images(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv", "default.src", DEFN)
    UpdateJob(src, [("role", "=", "system")],
              {"tool": "coalesce(tool, 'none')"}).run()
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_view_current(mv, src)


def test_upsert_eqdel_parent_scan_dirty_path(cat, base):
    """Group keys (role) are NOT in the eqdel key (conv_id, turn_idx): dirty
    groups must be derived by scanning the commit's parent snapshot."""
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv", "default.src", DEFN)
    batch = (base.filter(F.col("turn_idx") % 3 == 1)
             .withColumn("text", F.concat(F.lit("u:"), F.col("text"))))
    upsert(src, batch, ["conv_id", "turn_idx"])
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_view_current(mv, src)


def test_eqdel_covered_group_keys(cat, base):
    """Group key conv_id IS an eqdel key column: dirty set comes straight
    from the key tuples, no parent scan."""
    defn = MatViewDefn(
        group_keys=("conv_id",),
        aggs=(Agg("count_star", None, "n_rows"),
              Agg("max", "turn_idx", "max_turn")),
    )
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv2", "default.src", defn)
    victims = base.filter(F.col("turn_idx") >= 3) \
        .select("conv_id", "turn_idx").distinct()
    equality_delete(src, victims)
    res = refresh(mv)
    assert res.mode == "incremental"
    df = src.refresh().scan()
    assert canon(read_view(mv.refresh()), defn) == canon(
        full_state(df, defn), defn)


def test_minmax_tie_retraction_goes_dirty(cat, spark):
    """Two rows share the group minimum; deleting ONE must keep the min —
    only a recompute can know the multiplicity, so the group must go dirty
    and still come out correct."""
    rows = [("c1", 0, "user", "a", None, "2026-01-01T00:00:00"),
            ("c1", 1, "user", "b", None, "2026-01-01T00:00:00"),
            ("c1", 2, "user", "c", None, "2026-01-02T00:00:00")]
    df = spark.createDataFrame(rows, SCHEMA_DDL.replace(
        "ts timestamp", "ts string")).withColumn("ts", F.to_timestamp("ts"))
    src = make_source(cat, df)
    defn = MatViewDefn(group_keys=("role",),
                       aggs=(Agg("min", "ts", "first_ts"),
                             Agg("count_star", None, "n_rows")))
    mv = create_materialized_view(cat, "default.mv3", "default.src", defn)
    DeleteJob(src, [("turn_idx", "=", 0)]).run()
    assert refresh(mv).mode == "incremental"
    got = {r["role"]: (r["first_ts"], r["n_rows"])
           for r in read_view(mv.refresh()).collect()}
    assert got["user"][1] == 2
    assert got["user"][0].isoformat().startswith("2026-01-01")


def test_filtered_view(cat, base):
    defn = MatViewDefn(
        group_keys=("role",),
        aggs=(Agg("count_star", None, "n_rows"),
              Agg("sum", "turn_idx", "sum_turn")),
        filter="turn_idx >= 2",
    )
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv4", "default.src", defn)
    DeleteJob(src, [("turn_idx", "<", 3)]).run()  # straddles the filter
    assert refresh(mv).mode == "incremental"
    assert_view_current(mv, src, defn)


def test_null_group_keys_survive(cat, base):
    """tool is nullable: NULL group-key tuples must round-trip through the
    json surrogate key (eqdel equality is null-unsafe on raw columns)."""
    defn = MatViewDefn(group_keys=("tool",),
                       aggs=(Agg("count_star", None, "n_rows"),))
    src = make_source(cat, base)
    assert src.scan().filter(F.col("tool").isNull()).count() > 0
    mv = create_materialized_view(cat, "default.mv5", "default.src", defn)
    src.append(base.filter(F.col("role") == "user"), n_files=1)
    assert refresh(mv).mode == "incremental"
    assert_view_current(mv, src, defn)
    # the NULL group updated in place: exactly one NULL row in the view
    nulls = read_view(mv.refresh()).filter(F.col("tool").isNull()).count()
    assert nulls == 1


def test_fallback_full_refresh_when_cdf_off(cat, base):
    src = make_source(cat, base, cdf=False)
    mv = create_materialized_view(cat, "default.mv6", "default.src", DEFN)
    DeleteJob(src, [("turn_idx", "<", 1)]).run()  # row change, no CDF
    res = refresh(mv)
    assert res.mode == "full"
    assert res.fallback_reason
    assert_view_current(mv, src)


def test_fallback_full_refresh_on_restore_in_window(cat, base):
    # RESTORE rewinds visible rows without change files; the feed raises for
    # the unknown-op snapshot and the refresh must fall back to a full
    # recompute of the restored state — never a wrong incremental apply
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mvr", "default.src", DEFN)
    keep = src.current_snapshot().snapshot_id
    src.append(base.limit(80), n_files=1)
    src.restore(keep)
    res = refresh(mv)
    assert res.mode == "full"
    assert res.fallback_reason and "restore" in res.fallback_reason
    assert_view_current(mv, src)


def test_full_refresh_requested(cat, base):
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv7", "default.src", DEFN)
    src.append(base.limit(50), n_files=1)
    res = refresh(mv, full=True)
    assert res.mode == "full"
    assert_view_current(mv, src)


def test_random_op_sequence_stays_exact(cat, base, spark):
    """Conformance-style: a random interleaving of appends / CoW deletes /
    updates / upserts / eqdels with a refresh after each — the view must
    equal the from-scratch aggregate EVERY time."""
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv8", "default.src", DEFN)
    rng = random.Random(7)
    for step in range(8):
        op = rng.choice(["append", "delete", "update", "upsert", "eqdel"])
        if op == "append":
            src.append(base.filter(F.col("turn_idx") == rng.randrange(4)),
                       n_files=1)
        elif op == "delete":
            DeleteJob(src, [("turn_idx", "=", rng.randrange(6))]).run()
        elif op == "update":
            UpdateJob(src, [("role", "=", rng.choice(["user", "assistant"]))],
                      {"turn_idx": "turn_idx + 1"}).run()
        elif op == "upsert":
            b = (src.scan().filter(F.col("turn_idx") % 5 == step % 5)
                 .limit(200).withColumn("text", F.lit(f"s{step}")))
            if not b.isEmpty():
                upsert(src, b, ["conv_id", "turn_idx"])
        elif op == "eqdel":
            k = (src.scan().select("conv_id").distinct().limit(3))
            if not k.isEmpty():
                equality_delete(src, k)
        refresh(mv)
        assert_view_current(mv, src)


def test_approx_count_distinct_incremental(cat, base):
    """HLL sketch state: inserts MERGE (register-max union == one-pass
    sketch, so incremental estimate equals full recompute exactly);
    retraction of a non-null value dirties the group."""
    defn = MatViewDefn(
        group_keys=("role",),
        aggs=(Agg("approx_count_distinct", "conv_id", "n_convs"),
              Agg("count_star", None, "n_rows")),
    )
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv9", "default.src", defn)
    assert_view_current(mv, src, defn)
    # insert-only window: pure sketch-union arithmetic, no recompute
    src.append(base.filter(F.col("turn_idx") == 0)
               .withColumn("conv_id", F.concat("conv_id", F.lit("-x"))),
               n_files=1)
    assert refresh(mv).mode == "incremental"
    assert_view_current(mv, src, defn)
    # sanity: estimates at this scale are exact-ish and must reflect -x convs
    got = {r["role"]: r["n_convs"]
           for r in read_view(mv.refresh()).collect()}
    exact = {r["role"]: r["n"]
             for r in src.refresh().scan().groupBy("role")
             .agg(F.countDistinct("conv_id").alias("n")).collect()}
    for role, est in got.items():
        assert abs(est - exact[role]) <= max(2, 0.05 * exact[role])
    # retraction dirties and recomputes the touched groups
    DeleteJob(src, [("turn_idx", "=", 1)]).run()
    assert refresh(mv).mode == "incremental"
    assert_view_current(mv, src, defn)


def test_maintain_refreshes_dependent_views(cat, base):
    """MAINTAIN on the source table keeps its materialized views fresh (the
    DLT 'platform keeps gold current' behavior)."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql

    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv10", "default.src", DEFN)
    src.append(base.filter(F.col("turn_idx") == 0), n_files=1)
    res = run_sql(cat, "MAINTAIN default.src")
    assert res.views_refreshed and res.views_refreshed[0][0] == "default.mv10"
    assert res.views_refreshed[0][1].mode == "incremental"
    assert_view_current(mv, src)


def test_maintain_refreshes_views_before_expiring_snapshots(cat, base):
    """Aggressive retention must not demote view refreshes to full rebuilds:
    MAINTAIN refreshes dependent views BEFORE snapshot expiration, while the
    view pointer's feed window is still resolvable."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql

    src = make_source(cat, base)
    src.set_property("maintenance.expire.keep-last", "1")
    mv = create_materialized_view(cat, "default.mv11", "default.src", DEFN)
    # pointer falls several snapshots behind; keep-last=1 would expire it
    src.append(base.filter(F.col("turn_idx") == 0), n_files=1)
    src.append(base.filter(F.col("turn_idx") == 1), n_files=1)
    res = run_sql(cat, "MAINTAIN default.src")
    assert res.expiration is not None and res.expiration.expired_snapshot_ids
    assert res.views_refreshed[0][1].mode == "incremental", \
        res.views_refreshed[0][1].fallback_reason
    assert_view_current(mv, src)


def test_refresh_survives_source_table_rename(cat, base):
    """Views bind to the source by LOCATION (mv.source-location), and a
    catalog rename never moves bytes — so renaming the source table must
    leave incremental refresh working untouched."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.sql import run_sql

    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv12", "default.src", DEFN)
    run_sql(cat, "ALTER TABLE default.src RENAME TO default.src_renamed")
    src = cat.load_table("default.src_renamed")
    src.append(base.filter(F.col("turn_idx") == 0), n_files=1)
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_view_current(mv, src)
    # MAINTAIN on the renamed source still discovers and refreshes the view
    src.append(base.filter(F.col("turn_idx") == 1), n_files=1)
    out = run_sql(cat, "MAINTAIN default.src_renamed")
    assert out.views_refreshed and out.views_refreshed[0][0] == "default.mv12"
    assert_view_current(mv, src)


def test_in_pruning_predicates(spark):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.matview import (
        _in_pruning_predicates,
    )

    df = spark.createDataFrame([("a",), ("b",), ("a",)], "k string")
    preds = _in_pruning_predicates(df, "k")
    assert preds is not None and preds[0][1] == "in" \
        and sorted(preds[0][2]) == ["a", "b"]
    # NULL values or an oversized set fall back to the unpruned scan
    dfn = spark.createDataFrame([("a",), (None,)], "k string")
    assert _in_pruning_predicates(dfn, "k") is None
    big = spark.range(50).selectExpr("cast(id as string) as k")
    assert _in_pruning_predicates(big, "k", cap=10) is None


def test_refresh_crash_before_commit_is_exactly_once(cat, base, monkeypatch):
    """A refresh that dies after computing (and even writing staging data)
    but BEFORE the commit leaves no visible change and no advanced pointer;
    the retry applies the identical window exactly once."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table

    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv11", "default.src", DEFN)
    src.append(base.filter(F.col("turn_idx") == 0), n_files=1)
    before_rows = canon(read_view(mv.refresh()), DEFN)
    before_ptr = last_refresh_snapshot(mv.refresh())

    real_commit = Table._commit_append

    def boom(self, *a, **kw):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(Table, "_commit_append", boom)
    with pytest.raises(RuntimeError, match="injected"):
        refresh(mv)
    monkeypatch.setattr(Table, "_commit_append", real_commit)

    mv = mv.refresh()
    assert canon(read_view(mv), DEFN) == before_rows       # nothing visible
    assert last_refresh_snapshot(mv) == before_ptr         # pointer intact
    res = refresh(mv)
    assert res.mode == "incremental"
    assert_view_current(mv, src)
    # and the retry advanced the pointer atomically with the data
    assert last_refresh_snapshot(mv.refresh()) == \
        src.refresh().current_snapshot().snapshot_id


def test_source_rename_fails_loudly_not_silently(cat, base):
    """RENAME COLUMN on a source column the view references must surface as
    an error at the next refresh — never a silently wrong view. (The fix is
    DROP + re-CREATE of the view; the defn pins the old names.)"""
    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv12", "default.src", DEFN)
    src.rename_column("turn_idx", "turn_no")
    src.refresh().append(
        base.withColumnRenamed("turn_idx", "turn_no"), n_files=1)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="turn_idx"):
        refresh(mv)


def test_noop_refresh_advances_pointer_past_layout_commits(cat, base, spark):
    """A refresh whose window holds only layout commits (compaction) must
    ADVANCE the source-snapshot pointer via an empty commit: otherwise the
    expiration that follows a maintenance refresh can expire the pointed-at
    snapshot and demote the NEXT refresh to a full recompute."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import (
        CompactionJob,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.expire import (
        ExpireSnapshotsJob,
    )

    src = make_source(cat, base)
    mv = create_materialized_view(cat, "default.mv", "default.src", DEFN)
    CompactionJob(src.refresh()).run()          # layout-only window
    r = refresh(mv)
    assert r.mode == "noop"
    cur = src.refresh().current_snapshot().snapshot_id
    assert last_refresh_snapshot(mv.refresh()) == cur, \
        "noop refresh must advance the pointer"
    # aggressive expiration retires everything but the latest snapshot;
    # with the pointer advanced, the next (real) refresh stays incremental
    ExpireSnapshotsJob(src.refresh(), keep_last=1, grace_period_sec=0).run()
    extra = generate_transcripts(spark, n_convs=5, span_days=2, seed=7)
    src.refresh().append(extra, n_files=1)
    r2 = refresh(mv)
    assert r2.mode == "incremental", r2.fallback_reason
    assert_view_current(mv, src)
