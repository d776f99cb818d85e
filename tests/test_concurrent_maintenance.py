"""Adversarial concurrency: micro-batch appends racing MAINTAIN's
compact+cluster+expire loop from another thread.

The serial conformance generator (tests/test_conformance.py) covers op
SEQUENCES; this file covers genuine interleaving — both sides go through
the 20-retry optimistic-commit loop against one metadata log, and the
invariants are (a) every commit lands exactly once (no lost appends),
(b) the final scan is row-equal to the union of everything appended,
(c) maintenance passes either converge or abort cleanly (CommitConflict),
never corrupt."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import (
    CommitConflict, Table,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.maintain import (
    run_maintenance,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)

N_BATCHES = 6
MAINT_PASSES = 4


@pytest.mark.parametrize("seed", [11, 23])
def test_appends_race_maintenance_loop(spark, tmp_path, seed):
    loc = str(tmp_path / "t")
    schema = T.StructType.fromDDL(SCHEMA_DDL)
    writer_t = Table.create(
        spark, loc, schema, PartitionSpec.of(days("ts_day", "ts")),
        properties={
            "write.target-file-size-bytes": str(256 * 1024),
            "maintenance.expire.keep-last": "2",
            "maintenance.expire.grace-sec": "0",
        },
        cluster_keys=["conv_id", "turn_idx"],
    )
    maint_t = Table.load(spark, loc)

    batches = [
        generate_transcripts(spark, n_convs=12, hot_convs=1, span_days=3,
                             seed=seed + i)
        .withColumn("tool", F.lit(f"batch-{i}"))
        .cache()
        for i in range(N_BATCHES)
    ]
    expected_rows = sum(b.count() for b in batches)

    writer_errors: list[BaseException] = []
    appended = threading.Event()

    def writer():
        try:
            for b in batches:
                writer_t.append(b, n_files=2)
                appended.set()
        except BaseException as e:  # pragma: no cover - surfaced below
            writer_errors.append(e)

    th = threading.Thread(target=writer)
    th.start()
    appended.wait(timeout=120)
    maint_results, maint_conflicts = [], 0
    for _ in range(MAINT_PASSES):
        try:
            maint_results.append(run_maintenance(maint_t, max_concurrency=4))
        except CommitConflict:
            maint_conflicts += 1  # clean abort is acceptable; corruption is not
    th.join(timeout=300)
    assert not th.is_alive(), "writer thread wedged"
    assert not writer_errors, f"writer failed: {writer_errors!r}"
    assert maint_results, "every maintenance pass aborted — retry loop broken"

    # convergence: one final quiescent pass, then exact scan equivalence
    run_maintenance(maint_t, max_concurrency=4)
    final = Table.load(spark, loc)
    got = final.scan()
    assert got.count() == expected_rows
    per_batch = {r["tool"]: r["n"] for r in
                 got.groupBy("tool").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_batch == {f"batch-{i}": batches[i].count()
                         for i in range(N_BATCHES)}, "a commit was lost"
    # checksum-grade equivalence: sorted row multiset matches the input union
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    diff = got.exceptAll(union).count() + union.exceptAll(got).count()
    assert diff == 0
    for b in batches:
        b.unpersist()
