"""Snapshot expiration + orphan-file GC.

The retention half of the Delta ACID layer the reference gets for free
(`_resources/PIPELINE_OVERVIEW.md:319`; VACUUM analogue). Two separated steps:

1. ``Table.expire_snapshots`` (metadata): drop all but the newest K snapshots,
   reference-count data files across RETAINED snapshots, report files whose
   refcount fell to zero.
2. Orphan GC (this job): files on disk minus files referenced by any retained
   snapshot — computed as a distributed ``left_anti`` join (SURVEY.md §2.3),
   so a 10^9-file listing never needs driver memory. Files referenced by the
   ledgers of in-flight (not yet job-committed) maintenance jobs are protected:
   a crashed compaction's staged outputs must survive until its resume commits
   them. A modification-time grace period guards racing writers.

Safety invariant (tested): GC never deletes a file referenced by ANY retained
snapshot, and a reader pinned to a retained snapshot scans identically after GC.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from ..format import manifest as mf
from ..format.table import Table
from .ledger import Ledger


@dataclass
class ExpireResult:
    expired_snapshot_ids: list[int]
    candidate_files: int
    deleted_files: int
    protected_inflight: int
    bytes_reclaimed: int


def _inflight_ledger_outputs(table: Table) -> set[str]:
    """Output paths recorded by ledgers whose job has not reached job-committed."""
    ldir = os.path.join(table.location, "metadata", "ledger")
    if not os.path.isdir(ldir):
        return set()
    out: set[str] = set()
    for name in os.listdir(ldir):
        if not name.endswith(".jsonl"):
            continue
        led = Ledger(table.location, name[:-6], "any")
        if led.job_done():
            continue
        for rec in led.records():
            for f in rec.get("output_files", []):
                out.add(f["path"])
    return out


def referenced_files(table: Table) -> set[str]:
    """All data files referenced by any retained snapshot (any status)."""
    refs: set[str] = set()
    seen_lists: set[str] = set()
    for s in table.meta.snapshots:
        if s.manifest_list in seen_lists:
            continue
        seen_lists.add(s.manifest_list)
        for rec in mf.read_manifest_list(s.manifest_list):
            for e in mf.read_manifest(rec["path"]):
                refs.add(e["path"])
    return refs


class ExpireSnapshotsJob:
    def __init__(
        self,
        table: Table,
        *,
        keep_last: int = 3,
        delete_orphans: bool = True,
        grace_period_sec: float = 0.0,
    ):
        self.table = table
        self.keep_last = keep_last
        self.delete_orphans = delete_orphans
        self.grace_period_sec = grace_period_sec

    def run(self) -> ExpireResult:
        expired_ids, _dead = self.table.expire_snapshots(self.keep_last)
        if not self.delete_orphans:
            return ExpireResult(expired_ids, 0, 0, 0, 0)

        spark = self.table.spark
        on_disk = self.table.all_data_files_on_disk()
        refs = referenced_files(self.table)
        protected = _inflight_ledger_outputs(self.table)

        # distributed anti join: disk listing \ referenced (scales past driver RAM;
        # in this deployment listings are local, on a cluster both sides come from
        # object-store inventory / manifest scans as DataFrames)
        disk_df = spark.createDataFrame([(p,) for p in on_disk], "path string")
        refs_df = spark.createDataFrame(
            [(p,) for p in sorted(refs | protected)] or [("",)], "path string"
        )
        orphans = [
            r["path"]
            for r in disk_df.join(refs_df, "path", "left_anti").collect()
        ]

        now = time.time()
        deleted = 0
        reclaimed = 0
        n_protected = len([p for p in on_disk if p in protected])
        for p in orphans:
            try:
                if self.grace_period_sec and now - os.path.getmtime(p) < self.grace_period_sec:
                    continue
                sz = os.path.getsize(p)
                os.remove(p)
                deleted += 1
                reclaimed += sz
            except FileNotFoundError:
                continue
        return ExpireResult(expired_ids, len(orphans), deleted, n_protected, reclaimed)
