"""Change data feed — row-level CDC between snapshots (Delta CDF analogue).

The reference's medallion layers read each other incrementally ("SDP handles
checkpointing", `PIPELINE_OVERVIEW.md:165`); its platform exposes row-level
changes as `table_changes()`. This module is that surface for our format:

- **Appends are free.** An append snapshot's inserted rows ARE its added data
  files (manifest entries with ``status=ADDED`` for that snapshot), so the
  feed reads them directly — no write amplification on the hot ingest path,
  exactly like Delta CDF.
- **Row-changing commits record change files at write time.** With the
  ``write.change-data-feed.enabled`` table property, DELETE / UPDATE / MERGE
  write the changed rows (+ ``_change_type`` of ``delete`` /
  ``update_preimage`` / ``update_postimage`` / ``insert``) as parquet under
  ``<table>/changes/<uuid>/`` and point to the directory from the snapshot
  summary (``change-data-dir``). Reconstructing a DELETE's victims after the
  fact would mean diffing rewritten files row-by-row — at 100 TB that is a
  full-table join, so the writer pays the (small, proportional-to-changes)
  cost instead.
- **Layout-only commits emit nothing.** Compaction / clustering / expire
  move bytes, not rows; the feed skips ``replace`` and ``expire`` snapshots.

``change_feed(table, from, to)`` unions the per-snapshot slices with a
``_commit_snapshot_id`` column. Commits that changed rows but recorded no
change files (CDF was off) fail loudly rather than returning a wrong feed.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..format import manifest as mf
from ..format.table import Table

CHANGE_TYPE_COL = "_change_type"
COMMIT_COL = "_commit_snapshot_id"


def cdf_enabled(table: Table) -> bool:
    return table.meta.properties.get("write.change-data-feed.enabled") == "true"


def write_change_data(table: Table, changes: DataFrame) -> str:
    """Write a job's change rows (must already carry ``_change_type``) under
    ``<table>/changes/``; returns the directory path for the snapshot summary.

    Lives outside ``data/`` so orphan-file GC (which scans only the data
    tree) never races it; expiration of the owning snapshot is the natural
    retention boundary for the change files themselves."""
    out = os.path.join(table.location, "changes", uuid.uuid4().hex[:16])
    changes.write.mode("error").parquet(out)
    return out


def _added_data_files(table: Table, snapshot) -> list[str]:
    """Data files first added by exactly this snapshot (manifest status)."""
    paths = []
    for rec in mf.read_manifest_list(snapshot.manifest_list):
        if rec.get("added_snapshot_id") != snapshot.snapshot_id:
            continue
        for e in mf.read_manifest(rec["path"]):
            if (e["status"] == mf.STATUS_ADDED
                    and e["snapshot_id"] == snapshot.snapshot_id
                    and e.get("content", "data") == "data"):
                paths.append(e["path"])
    return paths


def change_feed(
    table: Table,
    from_snapshot_id: int | None,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Row-level changes committed AFTER ``from_snapshot_id`` (exclusive, None
    = table start) up to ``to_snapshot_id`` (inclusive, None = current)."""
    spark = table.spark
    schema = table.schema
    snaps = sorted(table.meta.snapshots, key=lambda s: s.sequence_number)
    seq = {s.snapshot_id: s.sequence_number for s in snaps}
    lo = -1 if from_snapshot_id is None else seq[from_snapshot_id]
    hi = (snaps[-1].sequence_number if to_snapshot_id is None
          else seq[to_snapshot_id])

    empty = (spark.createDataFrame([], schema)
             .withColumn(CHANGE_TYPE_COL, F.lit("insert"))
             .withColumn(COMMIT_COL, F.lit(0).cast("long")))
    slices: list[DataFrame] = [empty]
    for s in snaps:
        if not (lo < s.sequence_number <= hi):
            continue
        cdir = s.summary.get("change-data-dir")
        if cdir is not None:
            sl = (spark.read.parquet(cdir)
                  .withColumn(COMMIT_COL, F.lit(s.snapshot_id)))
        elif s.operation == "append":
            added = _added_data_files(table, s)
            if not added:
                continue
            sl = (spark.read.schema(schema).parquet(*added)
                  .withColumn(CHANGE_TYPE_COL, F.lit("insert"))
                  .withColumn(COMMIT_COL, F.lit(s.snapshot_id)))
        elif s.operation in ("replace", "expire", "staged-append"):
            # layout/metadata only — no VISIBLE row change (a staged append's
            # rows enter the feed at their publish snapshot, when readers can
            # first see them)
            continue
        else:
            raise ValueError(
                f"snapshot {s.snapshot_id} ({s.operation}) changed rows but "
                "recorded no change data — enable "
                "write.change-data-feed.enabled before row-changing commits"
            )
        slices.append(sl)
    out = slices[0]
    for sl in slices[1:]:
        out = out.unionByName(sl)
    return out
