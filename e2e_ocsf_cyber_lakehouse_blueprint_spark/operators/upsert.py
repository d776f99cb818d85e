"""Atomic UPSERT: one row-delta commit (Iceberg ``RowDelta`` analogue).

The streaming write pattern the reference delegates to Delta/DLT
(``append_flow`` fan-in is append-only; upserts there ride MERGE INTO). A
MERGE reads and rewrites every matched target file — O(matched data) per
batch. This operator instead commits, in ONE snapshot:

  - the batch's rows as ordinary data files, and
  - an equality-delete entry over the batch's key tuples.

Both are stamped with the SAME commit sequence; the eqdel's strict
``data_sequence <`` rule (format/manifest.py) therefore erases matching rows
only from PRE-EXISTING files — the batch's own rows survive their delete.
Net effect is last-writer-wins by key, with write cost O(batch + keys)
regardless of table size: no target row is read, ever. The deferred read
cost is paid once by ``RewriteDeletesJob`` (eqdel -> positional marks) or
folded away by any rewrite.

Atomicity: a single optimistic-commit snapshot — readers see the delete and
the new rows together or not at all; a crash before commit leaves only
GC-able staged files. Within-batch key duplicates are APPENDED AS-IS (the
eqdel never applies to same-sequence files); dedupe upstream (e.g. a
last-event-per-key window) when the source can repeat keys in one batch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame

from ..format.table import Table
from .delete import write_eqdel_file


@dataclass
class UpsertResult:
    snapshot_id: int
    rows_appended: int
    keys_deleted: int
    data_files_written: int
    elapsed_sec: float = 0.0


def upsert(
    table: Table,
    df: DataFrame,
    key_columns: Sequence[str],
    *,
    n_files: int | None = None,
    sort_within: Sequence[str] | None = None,
    summary_extra: dict | None = None,
) -> UpsertResult:
    """Last-writer-wins upsert of ``df`` into ``table`` by ``key_columns``
    as one atomic commit. See the module docstring for semantics."""
    t0 = time.time()
    missing = [k for k in key_columns if k not in df.columns]
    if missing:
        raise ValueError(f"upsert key columns not in batch: {missing}")
    aligned, _ = table._align_to_schema(df, merge_schema=False)
    table.check_constraints(aligned)
    # force the bloom/xxh64 harvest on the batch files: they sit on EVERY
    # scan's read path until MAINTAIN folds them, and the batch is small so
    # the key scan is batch-sized — without it, point lookups between the
    # upsert and the next clustering pass degrade to bounds-only pruning
    data_files = table.write_data_files(
        aligned, n_files=n_files, sort_within=sort_within, job_tag="upsert",
        harvest_key_stats=True)
    eq_files = write_eqdel_file(table, aligned.select(*key_columns))
    summary = {
        "job": "upsert",
        "eq-columns": ",".join(key_columns),
        "eq-deleted-keys": sum(f.record_count for f in eq_files),
    }
    summary.update(summary_extra or {})
    snap = table._commit_append(
        data_files + eq_files, summary_extra=summary, operation="upsert")
    return UpsertResult(
        snapshot_id=snap.snapshot_id,
        rows_appended=sum(f.record_count for f in data_files),
        keys_deleted=sum(f.record_count for f in eq_files),
        data_files_written=len(data_files),
        elapsed_sec=time.time() - t0,
    )
