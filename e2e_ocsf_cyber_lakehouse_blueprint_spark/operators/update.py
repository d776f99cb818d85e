"""UPDATE ... SET ... WHERE — predicate-scoped copy-on-write row update.

The single-statement sibling of MERGE (operators/merge.py) for the common
"patch rows in place" case Delta users express as ``UPDATE``: no source
relation, no join — just a predicate and column assignments. Scale shape is
identical to DELETE (operators/delete.py):

- **write-side pruning**: manifest min/max + partition values + derived xxh64
  bounds (plans/pruning.py) pick the candidate files; everything else is not
  read, not rewritten, not mentioned in the commit. An UPDATE touching one
  conversation rewrites that conversation's file neighborhood, not the table.
- **rewrite**: candidate files are scanned once; rows where the predicate is
  TRUE get the assignments applied (each assigned column becomes
  ``CASE WHEN pred THEN expr ELSE old END``), UNKNOWN/FALSE rows are copied
  byte-identical. Output is re-packed at target file size, sorted on the
  table's layout keys.
- **atomicity**: staged files + one copy-on-write snapshot; pinned readers
  keep the old snapshot; a pre-commit crash leaves only GC-able orphans.

Assignments are SQL expression strings evaluated against the pre-update row
(standard UPDATE semantics: all right-hand sides see the OLD values, so
``SET a = b, b = a`` swaps). Assigned expressions are cast to the column's
declared type — the table schema never drifts through an UPDATE.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Mapping, Sequence

from pyspark.sql import functions as F

from ..format.table import Table
from ..format.stats import inputs_carry_key_stats
from ..plans.pruning import Predicate, prune_files
from .delete import record_rewrite_lineage
from .ledger import spill_metrics, split_size_for_rewrites


@dataclass
class UpdateResult:
    snapshot_id: int | None
    files_total: int
    files_untouched: int
    files_rewritten: int
    files_written: int
    rows_updated: int
    rows_copied: int
    elapsed_sec: float = 0.0
    spill_bytes: int = 0


class UpdateJob:
    """``UPDATE table SET col = expr[, ...] WHERE <conjunction>``."""

    def __init__(self, table: Table, predicates: Sequence[Predicate],
                 assignments: Mapping[str, str],
                 *, sort_keys: Sequence[str] | None = None):
        if not assignments:
            raise ValueError("UPDATE without SET assignments")
        cols = {f.name: f.dataType for f in table.schema.fields}
        missing = [c for c in assignments if c not in cols]
        if missing:
            raise ValueError(f"unknown column(s) in SET: {missing}")
        self.table = table
        self.predicates = list(predicates)
        self.assignments = dict(assignments)
        self._types = cols
        if sort_keys is None:
            sort_keys = [c for c in ("conv_id", "turn_idx") if c in cols]
        self.sort_keys = list(sort_keys)

    def _write_cdf(self, df, pred, schema) -> str | None:
        """Change-data-feed pre/post images for this UPDATE (when enabled):
        matched rows before and after assignments, over the affected files
        only. Both images come from one filtered scan shape — the write cost
        is proportional to the rows actually updated."""
        from .change_feed import CHANGE_TYPE_COL, cdf_enabled, write_change_data

        if not cdf_enabled(self.table):
            return None
        matched = df.filter(pred)
        pre = matched.select(*[F.col(c.name) for c in schema.fields]) \
                     .withColumn(CHANGE_TYPE_COL, F.lit("update_preimage"))
        post = matched.select(*[
            F.expr(self.assignments[c.name]).cast(c.dataType).alias(c.name)
            if c.name in self.assignments else F.col(c.name)
            for c in schema.fields
        ]).withColumn(CHANGE_TYPE_COL, F.lit("update_postimage"))
        return write_change_data(self.table, pre.unionByName(post))

    def run(self) -> UpdateResult:
        t0 = time.time()
        table = self.table
        table.refresh()
        start = table.current_snapshot()
        start_seq = start.sequence_number if start else None
        files = table.live_data_files()
        rewrite = prune_files(files, self.predicates, table.schema,
                              table.spec, aliases=table.rename_map())
        n_untouched = len(files) - len(rewrite)
        if not rewrite:
            return UpdateResult(None, len(files), n_untouched, 0, 0, 0, 0,
                                time.time() - t0, 0)
        spark = table.spark
        schema = table.schema
        # capture BEFORE the commit: the rewrite may retire the delete files
        n_dv_masked = table.deleted_row_count(rewrite)
        df = table.read_data_files(rewrite)
        pred = (F.coalesce(table._residual(self.predicates), F.lit(False))
                if self.predicates else F.lit(True))
        # all right-hand sides evaluate against the OLD row (standard UPDATE):
        # build every new column from the input df before any replacement
        updated = df.select(*[
            F.when(pred, F.expr(self.assignments[c.name]).cast(c.dataType))
             .otherwise(F.col(c.name)).alias(c.name)
            if c.name in self.assignments else F.col(c.name)
            for c in schema.fields
        ])
        # narrow metadata-pushdown count of matched rows (predicate only,
        # affected files only) — no second pass over the rewrite output
        n_updated = df.filter(pred).count()
        # Delta CHECK semantics: rewritten output must satisfy declared
        # constraints (free when none are declared — the probe early-returns)
        table.check_constraints(updated)
        cdir = self._write_cdf(df, pred, schema)
        # map-only rewrite, same shape as DELETE copy-on-write: splits
        # aligned to the target file size, each scan task applies the
        # assignments to its own files, locally sorts on the layout keys,
        # and writes its own outputs — no exchange of the rewritten rows
        target_size = table.property_int(
            "write.target-file-size-bytes", 128 * 1024 * 1024)
        with split_size_for_rewrites(table.spark, target_size):
            outs = table.write_data_files(
                updated, n_files=None,
                sort_within=self.sort_keys or None, job_tag="update",
                harvest_key_stats=inputs_carry_key_stats(rewrite),
            )
        summary = {
            "job": "update",
            "predicates": " AND ".join(
                f"{c} {op} {v!r}" for c, op, v in self.predicates) or "TRUE",
            "updated-records": n_updated,
        }
        if cdir:
            summary["change-data-dir"] = cdir
        snap = table.commit_rewrite(
            [f.path for f in rewrite], outs, operation="overwrite",
            summary_extra=summary, starting_sequence_number=start_seq,
        )
        record_rewrite_lineage(table, "update", snap, rewrite, outs)
        n_in = sum(f.record_count for f in rewrite) - n_dv_masked
        return UpdateResult(
            snapshot_id=snap.snapshot_id,
            files_total=len(files),
            files_untouched=n_untouched,
            files_rewritten=len(rewrite),
            files_written=len(outs),
            rows_updated=n_updated,
            rows_copied=n_in - n_updated,
            elapsed_sec=time.time() - t0,
            spill_bytes=spill_metrics(spark),
        )
