"""Crash-injection conformance for the commit protocol (VERDICT r4 item #6).

The concurrency race is covered by tests/test_concurrent_maintenance.py; these
tests kill a writer at the two seams that race never exercises:

1. between manifest/manifest-list writes and the ``vN.metadata.json``
   publish (``snapshot.commit_metadata``) — reopen must see the OLD
   snapshot exactly, and replaying the job must converge to the same state
   a single clean run produces;
2. inside ``commit_metadata`` between the atomic ``os.link`` version
   publish and the ``version-hint.text`` rename — the hint is stale but the
   version is durable, so a fresh load must resolve the NEW version via the
   forward scan;
3. between a MAINTAIN job's snapshot commit and its ledger
   ``record_job_done`` checkpoint — the commit is durable, so replay must
   be a no-op (idempotent), never a double rewrite.

Faults are injected by monkeypatching the exact seam function; every test
reloads the table from disk afterwards (a fresh reader, as after a real
driver death) before asserting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format import snapshot as snap
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.partition import (
    PartitionSpec, days,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import (
    ClusteringJob,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.compaction import (
    CompactionJob,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.ledger import Ledger
from e2e_ocsf_cyber_lakehouse_blueprint_spark.sources.transcripts import (
    SCHEMA_DDL, generate_transcripts,
)


class InjectedCrash(RuntimeError):
    pass


def _rows(t: Table):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.scan().select("conv_id", "turn_idx", "text").collect()
    )


@pytest.fixture()
def fragmented(spark, tmp_table_dir):
    df = generate_transcripts(spark, n_convs=40, hot_convs=1, hot_turns=60,
                              span_days=3, seed=11)
    t = Table.create(
        spark, tmp_table_dir, T.StructType.fromDDL(SCHEMA_DDL),
        PartitionSpec.of(days("ts_day", "ts")),
        properties={"write.target-file-size-bytes": str(512 * 1024),
                    "stats.columns": "conv_id,turn_idx,ts"},
    )
    t.append(df, n_files=12)
    return t


def test_crash_before_metadata_publish_preserves_old_snapshot(
        spark, fragmented, monkeypatch):
    t = fragmented
    before_rows = _rows(t)
    before_snap = t.current_snapshot().snapshot_id
    before_files = sorted(f.path for f in t.live_data_files())

    def boom(meta):
        raise InjectedCrash("killed between manifest write and publish")

    monkeypatch.setattr(snap, "commit_metadata", boom)
    with pytest.raises(InjectedCrash):
        CompactionJob(t).run()
    monkeypatch.undo()

    # a fresh reader (as after driver death) sees the old snapshot EXACTLY:
    # same current id, same live file set, same rows
    t2 = Table.load(spark, t.location)
    assert t2.current_snapshot().snapshot_id == before_snap
    assert sorted(f.path for f in t2.live_data_files()) == before_files
    assert _rows(t2) == before_rows

    # replay converges: the ledger's staged outputs are reused (resume) and
    # the commit lands; rows are byte-identical and files got compacted
    res = CompactionJob(t2).run()
    assert res.files_out < res.files_in
    assert res.skipped_resume > 0  # staged work survived the crash
    t3 = Table.load(spark, t.location)
    assert _rows(t3) == before_rows
    assert len(t3.live_data_files()) < len(before_files)


def test_crash_between_version_link_and_hint_rename(
        spark, fragmented, monkeypatch):
    t = fragmented
    before_rows = _rows(t)
    v_before = t.meta.version

    real_replace = snap.os.replace
    calls = {"n": 0}

    def crashing_replace(src, dst, *a, **k):
        # the ONLY os.replace inside commit_metadata is the hint publish;
        # crash on the first one after the version link
        if "version-hint" in str(dst):
            calls["n"] += 1
            raise InjectedCrash("killed between version link and hint")
        return real_replace(src, dst, *a, **k)

    monkeypatch.setattr(snap.os, "replace", crashing_replace)
    with pytest.raises(InjectedCrash):
        CompactionJob(t).run()
    monkeypatch.undo()
    assert calls["n"] == 1

    # the version file IS durable (os.link happened before the crash): a
    # fresh load must resolve it via the forward scan despite the stale hint
    assert snap.read_version_hint(t.location) < v_before + 1
    t2 = Table.load(spark, t.location)
    assert t2.meta.version == v_before + 1
    assert _rows(t2) == before_rows  # compaction: rows invariant

    # replay is idempotent: everything is already compacted, so the plan is
    # empty and no new snapshot is committed
    snap_id = t2.current_snapshot().snapshot_id
    res = CompactionJob(t2).run()
    assert res.files_in == 0
    t3 = Table.load(spark, t.location)
    assert t3.current_snapshot().snapshot_id == snap_id
    assert _rows(t3) == before_rows


def test_crash_between_commit_and_ledger_done_replay_is_noop(
        spark, fragmented, monkeypatch):
    t = fragmented
    before_rows = _rows(t)

    def boom(self, extra=None):
        raise InjectedCrash("killed between commit and ledger checkpoint")

    monkeypatch.setattr(Ledger, "record_job_done", boom)
    with pytest.raises(InjectedCrash):
        ClusteringJob(t, curve="zorder").run()
    monkeypatch.undo()

    # the snapshot commit preceded the crash: a fresh reader sees the
    # clustered table
    t2 = Table.load(spark, t.location)
    assert _rows(t2) == before_rows
    spec = ClusteringJob(t2, curve="zorder").sort_spec
    assert all(f.sort_order == spec for f in t2.live_data_files())
    snap_id = t2.current_snapshot().snapshot_id

    # replay after the commit landed must be a pure no-op (incremental skip
    # proves idempotence: no rewrite, no new snapshot)
    res = ClusteringJob(t2, curve="zorder").run()
    assert res.files_in == 0 and res.files_out == 0
    t3 = Table.load(spark, t.location)
    assert t3.current_snapshot().snapshot_id == snap_id
    assert _rows(t3) == before_rows
