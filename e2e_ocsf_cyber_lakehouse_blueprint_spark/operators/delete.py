"""DELETE FROM ... WHERE — predicate-scoped copy-on-write row deletion.

The reference's retention story is Delta's ``DELETE`` + VACUUM (its tables are
append-only DLT sinks, so row deletion arrives via the platform, not the
pipelines); this is that statement as an explicit engine job, with the
classic three-way file classification that makes predicate deletes cheap at
10^12-turn scale:

  1. **untouched** — manifest min/max (+ partition values, + derived xxh64
     bounds) prove the predicate can match no row: the file is not read, not
     rewritten, not even mentioned in the commit. This is `plans/pruning.py`
     reused as a *write*-side planner.
  2. **dropped whole** — the stats prove EVERY row matches (the dual bound
     check, conservative under truncated string bounds): the file is removed
     by a metadata-only manifest rewrite. Deleting an old day partition of a
     100 TB table moves zero bytes of data.
  3. **rewritten** — the predicate straddles the file's bounds: only these
     files are scanned, filtered with SQL NULL semantics (a row is deleted iff
     the predicate is TRUE — UNKNOWN/NULL rows survive, matching Spark/Delta
     ``DELETE``), and written back at target file size.

Atomicity / isolation: identical to MERGE — new files staged first, one
copy-on-write snapshot (operation="delete") swaps the affected set, pinned
readers keep the old snapshot, a pre-commit crash leaves only GC-able orphans.

Predicates are the engine's conjunctive triples (``plans/pruning.py``):
``(column, op, value)`` with op in ``= < <= > >= in notnull isnull``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..format.manifest import DataFile, decode_bound
from ..format.table import Table
from ..plans.pruning import Predicate, _norm_value, prune_files
from .ledger import Ledger, partition_key, spill_metrics


@dataclass
class DeleteResult:
    snapshot_id: int | None
    files_total: int
    files_untouched: int
    files_dropped: int      # metadata-only removals (every row matched)
    files_rewritten: int
    files_written: int
    rows_deleted: int
    elapsed_sec: float = 0.0
    spill_bytes: int = 0


def _all_rows_match(f: DataFile, col: str, op: str, value,
                    dtype: T.DataType | None) -> bool:
    """True only when the stats PROVE every row of ``f`` satisfies the
    predicate. Safe under Iceberg-style truncated string bounds (lower bound
    is <= the true min, upper bound >= the true max, so proofs built on
    ``lo >= v`` / ``hi <= v`` / ``lo == hi`` only get *harder*, never wrong).
    Missing stats -> False (the file is rewritten; correctness never depends
    on stats, mirroring the read-side pruner)."""
    nc = f.null_counts.get(col)
    if op == "isnull":
        return nc is not None and nc == f.record_count
    if nc is None or nc > 0:
        return False  # unknown/apparent nulls can't satisfy non-null comparisons
    if op == "notnull":
        return True
    lo_s, hi_s = f.lower_bounds.get(col), f.upper_bounds.get(col)
    if lo_s is None or hi_s is None:
        return False
    lo, hi = decode_bound(lo_s), decode_bound(hi_s)
    try:
        if op == "in":
            vals = {_norm_value(v, dtype) for v in value}
            return lo == hi and lo in vals
        v = _norm_value(value, dtype)
        if op == "=":
            return lo == hi == v
        if op == "<":
            return hi < v
        if op == "<=":
            return hi <= v
        if op == ">":
            return lo > v
        if op == ">=":
            return lo >= v
    except TypeError:
        return False
    return False


def record_rewrite_lineage(table: Table, job_type: str, snap,
                           removed: list[DataFile], outs: list[DataFile]) -> None:
    """Per-partition input->output lineage for a copy-on-write rewrite commit
    (the audit ledger contract shared by DELETE and UPDATE)."""
    job_id = f"{job_type}-{snap.parent_snapshot_id or 0}-{snap.snapshot_id}"
    ledger = Ledger(table.location, job_id, job_type)
    by_part_in: dict[str, list[str]] = {}
    part_of: dict[str, dict] = {}
    for f in removed:
        k = partition_key(f.partition)
        by_part_in.setdefault(k, []).append(f.path)
        part_of.setdefault(k, f.partition)
    by_part_out: dict[str, list[DataFile]] = {}
    for f in outs:
        by_part_out.setdefault(partition_key(f.partition), []).append(f)
        part_of.setdefault(partition_key(f.partition), f.partition)
    for k in sorted(set(by_part_in) | set(by_part_out)):
        po = by_part_out.get(k, [])
        ledger.record_partition(
            part_of[k], by_part_in.get(k, []), po,
            rows=sum(f.record_count for f in po),
            bytes_written=sum(f.file_size_bytes for f in po),
            spill_bytes=0,
        )
    ledger.record_job_done({"snapshot_id": snap.snapshot_id})


class DeleteJob:
    """``DELETE FROM table WHERE <conjunction>`` as a resumable-commit job."""

    def __init__(self, table: Table, predicates: Sequence[Predicate],
                 *, sort_keys: Sequence[str] | None = None):
        if not predicates:
            raise ValueError("DELETE without predicates: use drop/expire paths")
        self.table = table
        self.predicates = list(predicates)
        if sort_keys is None:
            cols = {f.name for f in table.schema.fields}
            sort_keys = [c for c in ("conv_id", "turn_idx") if c in cols]
        self.sort_keys = list(sort_keys)

    def classify(self) -> tuple[list[DataFile], list[DataFile], list[DataFile]]:
        """(untouched, dropped_whole, rewritten) live-file classification —
        pure metadata, no data scan."""
        table = self.table
        files = table.live_data_files()
        dtypes = {f.name: f.dataType for f in table.schema.fields}
        candidates = prune_files(files, self.predicates, table.schema, table.spec)
        cand_paths = {f.path for f in candidates}
        untouched = [f for f in files if f.path not in cand_paths]
        dropped, rewrite = [], []
        for f in candidates:
            if f.record_count and all(
                _all_rows_match(f, col, op, v, dtypes.get(col))
                for col, op, v in self.predicates
            ):
                dropped.append(f)
            else:
                rewrite.append(f)
        return untouched, dropped, rewrite

    def run(self) -> DeleteResult:
        t0 = time.time()
        table = self.table
        table.refresh()
        untouched, dropped, rewrite = self.classify()
        n_total = len(untouched) + len(dropped) + len(rewrite)
        if not dropped and not rewrite:
            return DeleteResult(None, n_total, n_total, 0, 0, 0, 0,
                                time.time() - t0, 0)
        spark = table.spark
        schema = table.schema
        outs: list[DataFile] = []
        if rewrite:
            df = spark.read.schema(schema).parquet(*[f.path for f in rewrite])
            # delete iff predicate is TRUE; UNKNOWN (NULL) rows are kept
            pred = table._residual(self.predicates)
            survivors = df.filter(~F.coalesce(pred, F.lit(False)))
            target_size = table.property_int(
                "write.target-file-size-bytes", 128 * 1024 * 1024)
            bytes_in = sum(f.file_size_bytes for f in rewrite)
            n_files = max(1, round(bytes_in / target_size))
            outs = table.write_data_files(
                survivors, n_files=n_files,
                sort_within=self.sort_keys or None, job_tag="delete",
            )

        removed = dropped + rewrite
        n_in = sum(f.record_count for f in removed)
        n_out = sum(f.record_count for f in outs)
        snap = table.commit_rewrite(
            [f.path for f in removed], outs, operation="delete",
            summary_extra={
                "job": "delete",
                "predicates": " AND ".join(
                    f"{c} {op} {v!r}" for c, op, v in self.predicates),
                "deleted-records": n_in - n_out,
                "dropped-whole-files": len(dropped),
            },
        )

        record_rewrite_lineage(table, "delete", snap, removed, outs)

        return DeleteResult(
            snapshot_id=snap.snapshot_id,
            files_total=n_total,
            files_untouched=len(untouched),
            files_dropped=len(dropped),
            files_rewritten=len(rewrite),
            files_written=len(outs),
            rows_deleted=n_in - n_out,
            elapsed_sec=time.time() - t0,
            spill_bytes=spill_metrics(spark),
        )
