"""Gold conformance (SURVEY.md §5): randomized-but-seeded op sequences.

A small Zipf-skewed transcripts table undergoes a random sequence of
maintenance ops (append / compact / cluster / merge / delete / update /
expire+GC / restore / partition-spec evolve); after EVERY op the full scan
must equal a
plain-DataFrame oracle maintained step-by-step — per-turn text equality under
stable (conv_id, turn_idx, ts) ordering, the north_rule invariant. Covers op
interactions no single-op test sees (merge right after cluster, expire after
merge, compact across a spec evolution, restore then expire, delete after
cluster, update before merge). Seeds are chosen so the three sequences
together cover every op, a restore, and a rewrite after an evolve."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, bucket, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import ClusteringJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import CompactionJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.expire import ExpireSnapshotsJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import DeleteJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.maintain import run_maintenance
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.manifests import (
    RewriteManifestsJob,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.merge import MergeIntoJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.update import UpdateJob
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)

KEYS = ["conv_id", "turn_idx"]


def rows(df):
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda x: (x[0], x[1], str(x[5]), str(x[3])))


def oracle_merge(target, source):
    keep = target.join(source.select(*KEYS), KEYS, "left_anti")
    ins = source.join(target.select(*KEYS), KEYS, "left_anti")
    upd = source.join(target.select(*KEYS), KEYS, "inner").select(*target.columns)
    return keep.unionByName(upd).unionByName(ins)


ALL_OPS = ["append", "compact", "cluster", "merge", "expire", "restore",
           "evolve", "delete", "update", "delete_mor", "maintain",
           "rewrite_manifests", "wap", "branch", "rewrite_deletes",
           "delete_eq", "upsert"]


def _run_sequence(spark, tmp_path, seed, seq_builder, cdf=False, mv_defn=None):
    """Shared conformance driver: build a table, apply the op sequence from
    ``seq_builder(rng)``, and assert scan == step-maintained oracle after
    EVERY op. Two standing invariants ride along:

    - metadata-only aggregation (plans/agg_pushdown.py): whenever the fast
      path claims COUNT(*), its manifest-derived answer must equal the
      oracle's row count — at every step, against whatever delete/restore/
      evolution state the sequence has produced.
    - with ``mv_defn``: a materialized view (continuous aggregate when the
      defn has a bucket) is refreshed after every op and must equal a
      from-scratch aggregate of the oracle — incremental where the change
      feed allows, full-fallback across replace/restore windows."""
    rng = random.Random(seed)
    base = generate_transcripts(
        spark, n_convs=60, hot_convs=2, hot_turns=80, span_days=6, seed=seed
    ).cache()
    props = {"write.target-file-size-bytes": str(256 * 1024)}
    if cdf:
        props["write.change-data-feed.enabled"] = "true"
    t = Table.create(
        spark, str(tmp_path / "tbl"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 2)),
        properties=props,
    )
    t.set_cluster_keys(["conv_id"])
    t.append(base, n_files=3)
    mv = None
    if mv_defn is not None:
        from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.matview import (
            create_materialized_view_table,
        )
        mv = create_materialized_view_table(
            spark, str(tmp_path / "mv"), t, mv_defn)
    oracle = base
    # oracle state per snapshot id, for restore targets
    hist = {t.current_snapshot().snapshot_id: oracle}
    specs = [
        PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket", "conv_id", 2)),
        PartitionSpec.of(days("ts_day", "ts")),
        PartitionSpec.of(days("ts_day", "ts"), bucket("conv_bucket4", "conv_id", 4)),
    ]

    seq = seq_builder(rng)
    for step, op in enumerate(seq):
        if op == "append":
            extra = generate_transcripts(
                spark, n_convs=20, hot_convs=0, span_days=6, seed=seed * 100 + step
            ).withColumn("conv_id", F.concat(F.col("conv_id"), F.lit(f"-s{step}"))).cache()
            t.append(extra, n_files=2)
            oracle = oracle.unionByName(extra)
        elif op == "compact":
            CompactionJob(t, max_concurrency=4).run()
        elif op == "cluster":
            curve = rng.choice(["zorder", "hilbert"])
            ClusteringJob(t, curve=curve, max_concurrency=4).run()
        elif op == "merge":
            src = (
                oracle.filter(F.pmod(F.xxhash64("conv_id"), F.lit(4)) == step % 4)
                .filter(F.col("turn_idx") % 3 == 0)
                .withColumn("text", F.concat(F.lit(f"fix{step}:"), F.col("text")))
                .cache()
            )
            if src.count() > 0:
                MergeIntoJob(t).run(src)
                oracle = oracle_merge(oracle, src).cache()
        elif op == "expire":
            ExpireSnapshotsJob(t, keep_last=2).run()
        elif op == "maintain":
            run_maintenance(t, max_concurrency=4)
        elif op == "rewrite_manifests":
            RewriteManifestsJob(t).run()  # pure metadata: oracle unchanged
        elif op == "wap":
            extra = generate_transcripts(
                spark, n_convs=10, hot_convs=0, span_days=6,
                seed=seed * 100 + step + 59,
            ).withColumn(
                "conv_id", F.concat(F.col("conv_id"), F.lit(f"-w{step}"))
            ).cache()
            staged = t.stage_append(extra, n_files=1)
            assert rows(t.scan()) == rows(oracle), "stage must be invisible"
            t.publish_snapshot(staged.snapshot_id)
            oracle = oracle.unionByName(extra)
        elif op == "branch":
            # cut a branch, append to it (must be invisible on main), then
            # fast-forward main to the head — ff cannot be refused here
            # because main does not move between cut and publish
            name = f"dev{step}"
            extra = generate_transcripts(
                spark, n_convs=8, hot_convs=0, span_days=6,
                seed=seed * 100 + step + 83,
            ).withColumn(
                "conv_id", F.concat(F.col("conv_id"), F.lit(f"-b{step}"))
            ).cache()
            t.create_branch(name)
            t.append_to_branch(name, extra, n_files=1)
            assert rows(t.scan()) == rows(oracle), "branch must be invisible"
            t.fast_forward_main(name)
            t.drop_ref(name)
            oracle = oracle.unionByName(extra)
        elif op == "rewrite_deletes":
            from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.rewrite_deletes import (
                RewriteDeletesJob,
            )
            RewriteDeletesJob(t, min_input_files=1).run()  # oracle unchanged
        elif op == "restore":
            candidates = [
                s.snapshot_id for s in t.snapshots
                if s.snapshot_id in hist
                and s.snapshot_id != t.current_snapshot().snapshot_id
            ]
            if candidates:
                sid = rng.choice(candidates)
                t.restore(sid)
                oracle = hist[sid]
        elif op == "evolve":
            t.set_partition_spec(specs[rng.randrange(len(specs))])
        elif op in ("delete", "delete_mor"):
            # delete one turn stripe of one role; NULL-semantics guard:
            # predicate columns are non-null in the fixture. delete_mor takes
            # the deletion-vector path, interleaving DVs with every other op.
            m = step % 3 + 3
            mode = "merge-on-read" if op == "delete_mor" else "copy-on-write"
            DeleteJob(t, [("turn_idx", "<", m), ("role", "=", "user")],
                      mode=mode).run()
            oracle = oracle.filter(
                ~((F.col("turn_idx") < m) & (F.col("role") == "user"))).cache()
        elif op == "delete_eq":
            from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.delete import (
                equality_delete,
            )
            keys = (oracle.select("conv_id").distinct()
                    .orderBy("conv_id").limit(2 + step % 3)).cache()
            equality_delete(t, keys)
            oracle = oracle.join(keys, "conv_id", "left_anti").cache()
        elif op == "upsert":
            from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.upsert import (
                upsert,
            )
            batch = oracle.filter(
                F.col("turn_idx") % 5 == step % 5
            ).withColumn(
                "text", F.concat(F.lit(f"up{step}:"), F.col("text"))
            ).cache()
            upsert(t, batch, ["conv_id", "turn_idx"], n_files=1)
            oracle = oracle.join(
                batch.select("conv_id", "turn_idx").distinct(),
                ["conv_id", "turn_idx"], "left_anti",
            ).unionByName(batch).cache()
        elif op == "update":
            m = step % 4
            UpdateJob(
                t, [("turn_idx", "=", m)],
                {"text": f"concat('u{step}:', text)", "tool": "coalesce(tool, 'none')"},
            ).run()
            hit = F.col("turn_idx") == m
            oracle = oracle.withColumn(
                "text", F.when(hit, F.concat(F.lit(f"u{step}:"), F.col("text")))
                         .otherwise(F.col("text"))
            ).withColumn(
                "tool", F.when(hit, F.coalesce(F.col("tool"), F.lit("none")))
                         .otherwise(F.col("tool"))
            ).cache()
        hist[t.current_snapshot().snapshot_id] = oracle
        got = rows(t.scan())
        want = rows(oracle)
        assert got == want, f"divergence after step {step} ({op}) in {seq}"

        from e2e_ocsf_cyber_lakehouse_blueprint_spark.plans.agg_pushdown import (
            AggItem, metadata_agg,
        )
        fast = metadata_agg(t, [AggItem("count_star", None, "n")])
        if fast is not None:
            n = fast.collect()[0]["n"]
            assert n == len(want), \
                f"metadata COUNT(*) {n} != oracle {len(want)} after " \
                f"step {step} ({op}) in {seq}"

        if mv is not None:
            from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.matview import (
                full_state, read_view, refresh, user_columns,
            )
            refresh(mv)
            cols = user_columns(mv_defn)
            got_v = sorted(
                (tuple(r[c] for c in cols)
                 for r in read_view(mv.refresh()).collect()), key=str)
            want_v = sorted(
                (tuple(r[c] for c in cols)
                 for r in full_state(oracle, mv_defn).collect()), key=str)
            assert got_v == want_v, \
                f"matview divergence after step {step} ({op}) in {seq}"

    # final: live files on disk, every snapshot scannable, ledgers consistent
    for f in t.live_data_files():
        import os
        assert os.path.exists(f.path)


@pytest.mark.parametrize("seed", [31, 43, 44, 62, 77])
def test_op_sequence_conformance(spark, tmp_path, seed):
    # odd seeds run with the change-data-feed write paths enabled, so CDF
    # change-file writes interleave with every op (the feed itself is
    # verified in test_change_feed.py; here it must never perturb state)
    _run_sequence(spark, tmp_path, seed,
                  lambda rng: [rng.choice(ALL_OPS) for _ in range(8)],
                  cdf=seed % 2 == 1)


@pytest.mark.parametrize("seed", [5, 18])
def test_eqdel_evolution_branch_combined(spark, tmp_path, seed):
    """Equality deletes x partition-spec evolution x branches in ONE random
    sequence: the eqdel sequence rule must survive files written under
    different specs AND branch fast-forwards that splice in snapshots whose
    data_sequence interleaves with the deletes. Each sequence is a random
    shuffle of all three (plus rewrites that fold deletes), so every ordering
    pressure-tests the strict `data_sequence <` rule across spec eras."""
    mandatory = ["delete_eq", "evolve", "branch", "upsert", "delete_eq",
                 "evolve", "rewrite_deletes"]
    fill_pool = ["append", "compact", "cluster", "rewrite_manifests"]

    def build(rng):
        seq = mandatory + [rng.choice(fill_pool) for _ in range(3)]
        rng.shuffle(seq)
        return seq

    _run_sequence(spark, tmp_path, seed, build, cdf=False)


@pytest.mark.parametrize("seed", [13, 29])
def test_cagg_follows_random_sequence(spark, tmp_path, seed):
    """A continuous aggregate (time-bucket materialized view) refreshed
    after EVERY op of a random maintenance sequence must always equal a
    from-scratch rollup of the oracle — incremental refreshes across
    appends/deletes/upserts, full-refresh fallbacks across compaction/
    clustering/restore windows, eqdel parent-snapshot bucket derivation.
    The per-step metadata-COUNT invariant rides along for free."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.matview import (
        Agg, Bucket, MatViewDefn,
    )

    defn = MatViewDefn(
        group_keys=("hour", "role"),
        aggs=(Agg("count_star", None, "n_rows"),
              Agg("sum", "turn_idx", "sum_turn"),
              Agg("max", "ts", "last_ts")),
        buckets=(Bucket("hour", "ts", 7200),),
    )
    _run_sequence(spark, tmp_path, seed,
                  lambda rng: [rng.choice(ALL_OPS) for _ in range(8)],
                  cdf=True, mv_defn=defn)


def test_distributed_checksum_equivalence(spark, tmp_path):
    """Scan-equivalence via the DISTRIBUTED checksum operator (no driver-side
    collect of data rows): per-conv digests are invariant under compaction +
    clustering, and any single-row mutation changes its conversation digest."""
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions.checksum import (
        conv_checksum, table_fingerprint,
    )

    base = generate_transcripts(spark, n_convs=40, hot_convs=1, hot_turns=60,
                                span_days=4, seed=7)
    t = Table.create(
        spark, str(tmp_path / "ck"), T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"write.target-file-size-bytes": str(256 * 1024)},
    )
    t.append(base, n_files=4)
    before = conv_checksum(t.scan()).collect()
    fp_before = table_fingerprint(t.scan()).first()

    CompactionJob(t, max_concurrency=4).run()
    ClusteringJob(t, curve="zorder", max_concurrency=4).run()

    after = {r["conv_id"]: (r["n_turns"], r["conv_md5"])
             for r in conv_checksum(t.scan()).collect()}
    assert {r["conv_id"]: (r["n_turns"], r["conv_md5"]) for r in before} == after
    fp_after = table_fingerprint(t.scan()).first()
    assert tuple(fp_before) == tuple(fp_after)

    # sensitivity: one mutated row flips exactly that conversation's digest
    mutated = t.scan().withColumn(
        "text",
        F.when((F.col("conv_id") == before[0]["conv_id"]) & (F.col("turn_idx") == 0),
               F.lit("tampered")).otherwise(F.col("text")),
    )
    diff = {r["conv_id"] for r in conv_checksum(mutated).collect()
            if after[r["conv_id"]][1] != r["conv_md5"]}
    assert diff == {before[0]["conv_id"]}
