"""Manifest rewrite — metadata compaction for the manifest layer itself.

Every append commit adds one manifest (`format/table.py:_commit_append`), the
exact behavior of the reference's streaming micro-batch sinks
(`gold_ocsf_iam_event_classes_delta_sinks.py:184-305` — 15 independent append
flows): at micro-batch cadence a table accumulates thousands of tiny
manifests, and scan *planning* — before any data is read — degrades to
O(commits). Iceberg ships `rewriteManifests` for this; Databricks hides the
same job behind checkpoint compaction. This is our version:

- read the current snapshot's manifest list, decode every live entry;
- sort entries by partition key (then path, for determinism) and re-pack them
  into manifests of ``maintenance.manifest.target-entries`` entries each;
- positional-delete manifests are re-packed the same way but never mixed with
  data manifests;
- commit a new snapshot (operation ``replace`` — layout/metadata only, no
  logical row change, so the change feed skips it) whose manifest list holds
  only the fresh manifests, all entries ``STATUS_EXISTING``.

Because entries are partition-sorted, each output manifest covers a narrow
partition range and its ``partition_summaries`` become tight — which is what
makes manifest-level pruning (`plans/pruning.py:prune_manifest_records`)
effective: a "last 7 days" query on a 10^12-turn table opens only the
manifests whose day-range summary intersects, never the whole manifest layer.

The rewrite is pure metadata: data files are untouched, older snapshots keep
their old manifest lists (time travel intact), and expired metadata ages out
with snapshot expiration. The entry decode/encode runs driver-side — the
manifest layer is O(files), metadata-sized, and the distributed read path
(`format/manifest.py:manifest_entries_df`) remains available for planning
over tables whose manifests outgrow the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from ..format import manifest as mf
from ..format import snapshot as snap
from ..format.table import Table
from .ledger import partition_key

DEFAULT_TARGET_ENTRIES = 4096


@dataclass
class RewriteManifestsResult:
    snapshot_id: int | None  # None -> no-op (already compact)
    manifests_before: int
    manifests_after: int
    entries: int
    elapsed_sec: float = 0.0


def _pack(files: list[mf.DataFile], target: int) -> list[list[mf.DataFile]]:
    """Partition-sorted fixed-size packing: consecutive slices of the sorted
    entry list, so each output manifest covers a contiguous partition range."""
    files = sorted(files, key=lambda f: (partition_key(f.partition), f.path))
    return [files[i:i + target] for i in range(0, len(files), target)]


class RewriteManifestsJob:
    def __init__(self, table: Table, *, target_entries: int | None = None):
        self.table = table
        self.target_entries = target_entries or table.property_int(
            "maintenance.manifest.target-entries", DEFAULT_TARGET_ENTRIES
        )

    def _decode(self, records: list[dict]) -> tuple[list[mf.DataFile], list[mf.DataFile]]:
        data: list[mf.DataFile] = []
        posdel: list[mf.DataFile] = []
        for rec in records:
            for e in mf.read_manifest(rec["path"]):
                if e["status"] == mf.STATUS_DELETED:
                    continue
                f = mf.DataFile.from_entry(e)
                (posdel if f.content == "posdel" else data).append(f)
        return data, posdel

    def run(self) -> RewriteManifestsResult:
        t0 = time.time()
        table = self.table
        table.refresh()
        parent = table.current_snapshot()
        if parent is None:
            return RewriteManifestsResult(None, 0, 0, 0, time.time() - t0)

        # no-op probe outside the commit loop: already at the packed optimum
        records = mf.read_manifest_list(parent.manifest_list)
        data, posdel = self._decode(records)
        optimum = max(1, -(-len(data) // self.target_entries)) + (
            max(1, -(-len(posdel) // self.target_entries)) if posdel else 0
        )
        if len(records) <= optimum:
            return RewriteManifestsResult(
                None, len(records), len(records), len(data) + len(posdel),
                time.time() - t0,
            )

        before = len(records)
        after_holder: list[int] = []

        def build(meta: snap.TableMetadata):
            # rebase: re-read the CURRENT manifest list each attempt so a
            # concurrent append's files are carried into the rewrite
            cur = meta.current_snapshot()
            recs = mf.read_manifest_list(cur.manifest_list)
            dfiles, pfiles = self._decode(recs)
            sid, parent_id, seq = table._next_ids(meta)
            new_records = []
            for group in _pack(dfiles, self.target_entries):
                mpath = table._new_manifest_path()
                new_records.append(
                    mf.write_manifest(mpath, group, sid, mf.STATUS_EXISTING)
                )
            for group in _pack(pfiles, self.target_entries):
                mpath = table._new_manifest_path()
                new_records.append(
                    mf.write_manifest(mpath, group, sid, mf.STATUS_EXISTING)
                )
            mlist = table._manifest_list_path(sid)
            mf.write_manifest_list(mlist, new_records)
            after_holder.append(len(new_records))
            summary = {
                "job": "rewrite-manifests",
                "manifests-before": len(recs),
                "manifests-after": len(new_records),
                "entries": len(dfiles) + len(pfiles),
            }
            s = snap.Snapshot(
                sid, parent_id, seq, snap.now_ms(), "replace", mlist, summary
            )
            return s, None

        committed = table._commit(build)
        return RewriteManifestsResult(
            snapshot_id=committed.snapshot_id,
            manifests_before=before,
            manifests_after=after_holder[-1],
            entries=len(data) + len(posdel),
            elapsed_sec=time.time() - t0,
        )
