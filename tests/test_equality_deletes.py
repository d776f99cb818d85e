"""Equality deletes (Iceberg v2 ``eqdel``): O(keys) delete writes with no
data scan, sequence-rule scan application, interplay with positional DVs,
conversion to positional marks via RewriteDeletesJob, fold + retirement
through rewrites, snapshot isolation, and WAP re-stamping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import ClusteringJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import (
    DeleteJob, equality_delete,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.maintain import run_maintenance
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.rewrite_deletes import (
    RewriteDeletesJob,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


def make_table(spark, loc, df, **props):
    t = Table.create(
        spark, loc, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts"), bucket("cb", "conv_id", 2)),
        properties={
            "write.target-file-size-bytes": str(512 * 1024),
            "stats.columns": "conv_id,turn_idx,role,tool,ts",
            **props,
        },
    )
    t.append(df, n_files=2, sort_within=("conv_id", "turn_idx"))
    return t


def rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in df.select("conv_id", "turn_idx", "text").collect()
    )


@pytest.fixture()
def base(spark):
    return generate_transcripts(
        spark, n_convs=40, hot_convs=2, span_days=4, seed=31).cache()


def test_eqdel_hides_matching_rows_without_touching_data(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    files_before = {f.path for f in t.live_data_files()}
    victims = [r["conv_id"] for r in
               base.select("conv_id").distinct().limit(3).collect()]
    res = equality_delete(
        t, spark.createDataFrame([(c,) for c in victims], "conv_id string"))
    assert res.mode == "equality"
    assert res.delete_files_written == 1
    # zero data files moved or removed
    assert {f.path for f in t.live_data_files()} == files_before
    expected = rows(base.filter(~F.col("conv_id").isin(victims)))
    assert rows(t.scan()) == expected
    # per-row text equality preserved for survivors (BASELINE invariant)
    assert rows(t.scan(predicates=[("conv_id", "=", victims[0])])) == []


def test_eqdel_sequence_rule_spares_later_appends(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    equality_delete(t, spark.createDataFrame([("conv-0000000001",)],
                                             "conv_id string"))
    late = base.filter(F.col("conv_id") == "conv-0000000001") \
               .withColumn("text", F.concat(F.lit("v2:"), F.col("text")))
    t.append(late, n_files=1)
    got = rows(t.scan().filter(F.col("conv_id") == "conv-0000000001"))
    want = rows(late)
    assert got == want  # only the re-appended rows, all of them


def test_eqdel_composite_key(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    keys = base.select("conv_id", "turn_idx").limit(7)
    equality_delete(t, keys)
    expected = rows(base.join(keys, ["conv_id", "turn_idx"], "left_anti"))
    assert rows(t.scan()) == expected


def test_eqdel_snapshot_isolation_and_time_travel(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    pre = t.current_snapshot().snapshot_id
    equality_delete(t, spark.createDataFrame([("conv-0000000002",)],
                                             "conv_id string"))
    assert rows(t.scan(snapshot_id=pre)) == rows(base)
    assert len(rows(t.scan())) < len(rows(base))


def test_rewrite_deletes_converts_eqdels_to_posdels(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    # mix: a positional MOR delete AND two equality deletes
    DeleteJob(t, [("turn_idx", "=", 0)], mode="merge-on-read").run()
    equality_delete(t, spark.createDataFrame([("conv-0000000003",)],
                                             "conv_id string"))
    equality_delete(t, base.select("conv_id", "turn_idx").limit(5))
    before = rows(t.scan())
    res = RewriteDeletesJob(t, min_input_files=1).run()
    assert res.eq_files_converted == 2
    assert res.eq_rows_materialized > 0
    assert t.live_eq_delete_files() == []
    assert rows(t.scan()) == before  # scan-equivalence across the conversion
    # converted DVs stay disjoint: masked row count equals the live delta
    masked = t.deleted_row_count(t.live_data_files())
    assert masked == base.count() - len(before)


def test_rewrites_fold_and_retire_eqdels(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    equality_delete(t, spark.createDataFrame([("conv-0000000004",)],
                                             "conv_id string"))
    before = rows(t.scan())
    # compaction folds the delete into whatever it rewrites; the eqdel stays
    # live while any pre-delete file survives (partitions already at target
    # size are skipped) — scan equivalence must hold either way
    CompactionJob(t, min_input_files=1).run()
    assert rows(t.scan()) == before
    # clustering rewrites EVERY partition -> no pre-delete file survives ->
    # commit_rewrite retires the dead eqdel in the same commit
    ClusteringJob(t, curve="zorder", max_concurrency=4).run()
    assert rows(t.scan()) == before
    assert t.live_eq_delete_files() == []


def test_maintain_triggers_eqdel_conversion(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base,
                   **{"maintenance.rewrite-deletes.max-count": "2"})
    for i in range(3):
        equality_delete(
            t, spark.createDataFrame([(f"conv-{i:010d}",)], "conv_id string"))
    res = run_maintenance(t)
    assert res.rewrite_deletes is not None
    assert t.live_eq_delete_files() == []


def test_wap_publish_restamps_past_eqdel(spark, tmp_path, base):
    """Rows staged BEFORE an equality delete but published AFTER logically
    appear at publish time — the delete must not erase them."""
    t = make_table(spark, str(tmp_path / "t"), base)
    staged_rows = base.filter(F.col("conv_id") == "conv-0000000005") \
                      .withColumn("text", F.concat(F.lit("wap:"), F.col("text")))
    staged = t.stage_append(staged_rows, n_files=1)
    equality_delete(t, spark.createDataFrame([("conv-0000000005",)],
                                             "conv_id string"))
    t.publish_snapshot(staged.snapshot_id)
    got = rows(t.scan().filter(F.col("conv_id") == "conv-0000000005"))
    assert got == rows(staged_rows)


def test_eqdel_file_entry_shape(spark, tmp_path, base):
    t = make_table(spark, str(tmp_path / "t"), base)
    equality_delete(t, base.select("conv_id", "turn_idx").limit(4))
    (e,) = t.live_eq_delete_files()
    assert e.content == "eqdel"
    assert e.eq_columns == ["conv_id", "turn_idx"]
    assert e.record_count == 4
    assert e.data_sequence > max(f.data_sequence
                                 for f in t.live_data_files())


def test_eqdel_bounds_prune_skips_disjoint_files(spark, tmp_path, base):
    """A delete whose key bounds are disjoint from a data file's stats must
    leave that file on the clean (no-anti-join) path; results stay exact."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import (
        _eq_bounds_may_match,
    )
    t = make_table(spark, str(tmp_path / "t"), base)
    # keys far outside the fixture's conv id range
    equality_delete(t, spark.createDataFrame([("zzz-1",), ("zzz-2",)],
                                             "conv_id string"))
    (e,) = t.live_eq_delete_files()
    assert e.lower_bounds["conv_id"] and e.upper_bounds["conv_id"]
    # every live data file is provably disjoint from the deleted key range
    assert all(not _eq_bounds_may_match(f, e) for f in t.live_data_files())
    assert rows(t.scan()) == rows(base)
    # and a real victim still gets masked (bounds overlap -> anti-join runs)
    equality_delete(t, spark.createDataFrame([("conv-0000000006",)],
                                             "conv_id string"))
    assert rows(t.scan()) == rows(
        base.filter(F.col("conv_id") != "conv-0000000006"))


def test_eqdel_bounds_helper_is_conservative(spark):
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.manifest import (
        DataFile, encode_bound,
    )
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import (
        _eq_bounds_may_match,
    )
    def df_(lo, hi, **kw):
        return DataFile(path="x", partition={}, record_count=1,
                        file_size_bytes=1,
                        lower_bounds={"k": encode_bound(lo)} if lo is not None else {},
                        upper_bounds={"k": encode_bound(hi)} if hi is not None else {},
                        **kw)
    d = df_("c", "f", content="eqdel", eq_columns=["k"])
    assert not _eq_bounds_may_match(df_("a", "b"), d)   # disjoint below
    assert not _eq_bounds_may_match(df_("g", "z"), d)   # disjoint above
    assert _eq_bounds_may_match(df_("b", "d"), d)       # overlap
    assert _eq_bounds_may_match(df_(None, None), d)     # missing stats
    d2 = df_(None, None, content="eqdel", eq_columns=["k"])
    assert _eq_bounds_may_match(df_("a", "b"), d2)      # missing delete bounds
    # mixed types never prove disjointness
    d3 = df_(1, 5, content="eqdel", eq_columns=["k"])
    assert _eq_bounds_may_match(df_("a", "b"), d3)


def test_eqdel_gc_lifecycle(spark, tmp_path, base):
    """A live eqdel survives orphan GC; once retired by a full rewrite and
    aged out of the snapshot log, the key parquet is collected."""
    import os
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.expire import (
        ExpireSnapshotsJob,
    )
    t = make_table(spark, str(tmp_path / "t"), base)
    equality_delete(t, spark.createDataFrame([("conv-0000000001",)],
                                             "conv_id string"))
    (e,) = t.live_eq_delete_files()
    ExpireSnapshotsJob(t, keep_last=1).run()
    assert os.path.exists(e.path)  # live: must never be GC'd
    expected = rows(t.scan())
    ClusteringJob(t, curve="zorder", max_concurrency=4).run()  # retires eqdel
    ExpireSnapshotsJob(t, keep_last=1).run()
    assert not os.path.exists(e.path)  # unreferenced now: collected
    assert rows(t.scan()) == expected


def test_eqdel_retry_after_lost_race_gets_fresh_sequence(
        spark, tmp_path, base, monkeypatch):
    """A retried equality delete must be stamped with the WINNING attempt's
    sequence, strictly above the concurrent append it lost the race to.
    write_manifest used to stamp DataFile objects in place (keyed on
    data_sequence==0), so the retry kept the first attempt's sequence and the
    strict `data_sequence <` rule silently spared rows committed before the
    delete — exactly the multi-writer case the retry loop exists for."""
    import e2e_ocsf_cyber_lakehouse_blueprint_spark.format.manifest as mf
    import e2e_ocsf_cyber_lakehouse_blueprint_spark.format.snapshot as snap_mod

    loc = str(tmp_path / "t")
    t = make_table(spark, loc, base)  # data committed at sequence 1
    victims = sorted({r["conv_id"] for r in
                      base.select("conv_id").limit(3).collect()})
    late = (
        base.filter(F.col("conv_id").isin(victims))
        .withColumn("conv_id", F.concat(F.lit("late-"), F.col("conv_id")))
    )
    victims_late = ["late-" + v for v in victims]

    orig = snap_mod.commit_metadata
    state = {"raced": False}

    def racing(meta):
        # First commit attempt (the eqdel): sneak a concurrent append into
        # the same metadata version so the eqdel loses and must rebase.
        if not state["raced"]:
            state["raced"] = True
            Table.load(spark, loc).append(late, n_files=1)
        return orig(meta)

    monkeypatch.setattr(snap_mod, "commit_metadata", racing)
    keys = spark.createDataFrame(
        [(v,) for v in victims + victims_late], "conv_id string")
    equality_delete(t, keys)
    monkeypatch.setattr(snap_mod, "commit_metadata", orig)

    t.refresh()
    paths = [r["path"] for r in
             mf.read_manifest_list(t.current_snapshot().manifest_list)]
    data_files = mf.live_files(paths, content="data")
    eqdels = mf.live_files(paths, content="eqdel")
    assert eqdels and data_files
    max_data_seq = max(f.data_sequence for f in data_files)
    assert max_data_seq >= 2  # the racing append really landed after base
    assert all(d.data_sequence > max_data_seq for d in eqdels)
    # last-writer-wins: the delete (committed after the racing append)
    # removes matching rows from BOTH appends
    assert t.scan().filter(
        F.col("conv_id").isin(victims + victims_late)).count() == 0
    remaining = t.scan().count()
    assert remaining == base.filter(~F.col("conv_id").isin(victims)).count()


# ------------------------------------------------- bloom-scoped eqdel scans

def test_blooms_disjoint_unit():
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.bloom import (
        blooms_disjoint, bloom_of_values,
    )
    a = bloom_of_values(["conv-a", "conv-b"], m=8192)
    b = bloom_of_values(["conv-c", "conv-d"], m=8192)
    c = bloom_of_values(["conv-b", "conv-z"], m=8192)
    assert blooms_disjoint(a, b)
    assert not blooms_disjoint(a, c)       # shares conv-b
    d = bloom_of_values(["conv-a"], m=4096)
    assert not blooms_disjoint(a, d)       # geometry mismatch: conservative


def test_eqdel_bloom_scopes_dirty_files(spark, tmp_path, base):
    """With 'stats.bloom-columns' on the key, the eqdel entry carries a
    bitset of the DELETED keys; scan planning proves disjointness per data
    file via bitset intersection, so only files genuinely holding a deleted
    conversation take the anti-join path — curve files' wide lexical bounds
    no longer mark everything dirty."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import (
        _eq_bounds_may_match,
    )
    t = make_table(spark, str(tmp_path / "t"), base,
                   **{"stats.bloom-columns": "conv_id"})
    ClusteringJob(t).run()
    victims = sorted({r["conv_id"] for r in t.scan().select("conv_id")
                      .distinct().collect()})[:2]
    before = rows(t.scan([("conv_id", "in", victims)]))
    assert before
    equality_delete(
        t, spark.createDataFrame([(v,) for v in victims], "conv_id string"))
    eq = t.live_eq_delete_files()
    assert len(eq) == 1 and eq[0].blooms, "eqdel entry must carry a bitset"
    datafiles = t.live_data_files()
    dirty = [f for f in datafiles if _eq_bounds_may_match(f, eq[0])]
    truly = [f for f in datafiles
             if t.read_parquet([f.path], t.schema)
                 .filter(F.col("conv_id").isin(victims)).count() > 0]
    assert {f.path for f in truly} <= {f.path for f in dirty}
    assert len(dirty) < len(datafiles), "bitset test must prune clean files"
    assert rows(t.scan([("conv_id", "in", victims)])) == []


def test_eqdel_inline_and_join_paths_agree(spark, tmp_path, base):
    """The driver-inlined literal filter (small key sets) and the broadcast
    anti-join fallback (large key sets) must produce identical survivors."""
    t1 = make_table(spark, str(tmp_path / "a"), base)
    t2 = make_table(spark, str(tmp_path / "b"), base)
    t2.meta.properties["scan.eqdel.inline-max-keys"] = "0"  # force join path
    keys = (base.select("conv_id", "turn_idx").distinct().limit(7))
    equality_delete(t1, keys)
    equality_delete(t2, keys)
    assert rows(t1.scan()) == rows(t2.scan())
    assert len(rows(t1.scan())) < base.count()


def test_cow_delete_preserves_key_stats(spark, tmp_path, base):
    """A copy-on-write DELETE over bloomed/curve files must re-harvest the
    key stats on its outputs (map-only rewrite keeps each file's key
    neighborhood) — otherwise point lookups degrade to bounds-only pruning
    until the next clustering pass."""
    t = make_table(spark, str(tmp_path / "t"), base,
                   **{"stats.bloom-columns": "conv_id",
                      "stats.bloom.layouts": "curve"})
    ClusteringJob(t).run()
    assert all(f.blooms for f in t.live_data_files())
    res = DeleteJob(t, [("turn_idx", "<", 2)], mode="copy-on-write").run()
    assert res.files_rewritten > 0
    rewritten = [f for f in t.live_data_files()
                 if "/delete-" in f.path]
    assert rewritten and all(f.blooms for f in rewritten), \
        "rewrite outputs must keep the bloom bitsets their inputs had"


def test_eqdel_nonintegral_keys_take_join_path_and_delete_correctly(
        spark, tmp_path, base, monkeypatch):
    """ADVICE r4: literal round-tripping of timestamp/decimal/binary keys
    through pyarrow -> F.lit can diverge from the parquet-to-parquet join
    comparison (session timezone, type inference), silently resurrecting
    deleted rows. Such key types must take the broadcast anti-join path
    even under the inline threshold — asserted by poisoning the inline
    tuple reader, which the join path never calls — and the delete itself
    must still land exactly."""
    t = make_table(spark, str(tmp_path / "t"), base)
    victim = (base.groupBy("conv_id", "ts").count()
              .filter(F.col("count") >= 1).limit(3)
              .select("conv_id", "ts"))
    n_victim_rows = base.join(victim, ["conv_id", "ts"], "left_semi").count()
    assert n_victim_rows > 0

    def poisoned(self, d, keys):
        raise AssertionError(
            "inline literal path must not run for timestamp keys")

    monkeypatch.setattr(Table, "_eqdel_key_tuples", poisoned)
    equality_delete(t, victim)
    survivors = t.scan()
    assert survivors.count() == base.count() - n_victim_rows
    assert survivors.join(victim, ["conv_id", "ts"], "left_semi").count() == 0
    # string/int-keyed deletes still use the inline fast path
    monkeypatch.undo()
    t2 = make_table(spark, str(tmp_path / "t2"), base)
    called = {"n": 0}
    real = Table._eqdel_key_tuples

    def counting(self, d, keys):
        called["n"] += 1
        return real(self, d, keys)

    monkeypatch.setattr(Table, "_eqdel_key_tuples", counting)
    equality_delete(t2, base.select("conv_id", "turn_idx").distinct().limit(4))
    t2.scan().count()
    assert called["n"] > 0
