"""REWRITE DELETES: positional-delete (deletion-vector) file maintenance.

Iceberg ``rewrite_position_delete_files`` analogue. Merge-on-read deletes
accumulate two kinds of metadata debt that data-file compaction alone never
pays down:

- *many small DV files* — every MOR DELETE commit writes its own batch;
  scans union all of them, so the broadcast side grows per commit;
- *dangling delete rows* — a DV that covers both live and since-removed
  data files survives ``commit_rewrite``'s all-covered-gone retirement with
  rows that can never match a scanned row again.

This job coalesces all live DV files into few range-partitioned outputs
(contiguous ``file_path`` slices → localized ``covered_paths``, prunable
scans) and drops rows pointing at files no longer live — one distributed
pass over the metadata-sized DV parquet, never the data files. DV row-set
disjointness (an invariant ``DeleteJob`` maintains) is preserved: this is a
repartition + filter, rows are never duplicated.

Cites reference delegation: deletion vectors are a platform flag there
(`utilities/utils.py:90,94`); the maintenance that keeps them healthy is
exactly what Databricks runs behind that flag.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import functions as F

from ..format.table import Table
from .delete import record_rewrite_lineage, write_posdel_files
from .ledger import spill_metrics


@dataclass
class RewriteDeletesResult:
    snapshot_id: int | None
    dv_files_in: int
    dv_files_out: int
    rows_in: int
    rows_out: int
    elapsed_sec: float = 0.0
    spill_bytes: int = 0


class RewriteDeletesJob:
    """Coalesce + prune the table's positional-delete files.

    ``target_rows_per_file`` sizes outputs (DV rows are two small columns;
    1M rows ≈ a few MB). ``min_input_files`` skips the no-op case — but a
    single DV file is still rewritten when pruning would drop rows."""

    def __init__(self, table: Table, *, target_rows_per_file: int = 1_000_000,
                 min_input_files: int = 2):
        self.table = table
        self.target_rows_per_file = target_rows_per_file
        self.min_input_files = min_input_files

    def run(self) -> RewriteDeletesResult:
        t0 = time.time()
        table = self.table
        table.refresh()
        dels = table.live_delete_files()
        rows_in = sum(d.record_count for d in dels)
        if not dels:
            return RewriteDeletesResult(None, 0, 0, 0, 0, time.time() - t0)

        spark = table.spark
        live = sorted(f.path for f in table.live_data_files())
        marks = spark.read.parquet(*[d.path for d in dels])
        live_df = spark.createDataFrame([(p,) for p in live] or [("",)],
                                        "file_path string")
        pruned = marks.join(F.broadcast(live_df), "file_path", "left_semi")
        rows_out = pruned.count()

        if rows_out == rows_in and len(dels) < self.min_input_files:
            return RewriteDeletesResult(None, len(dels), len(dels),
                                        rows_in, rows_in, time.time() - t0)

        outs = []
        if rows_out:
            n_out = max(1, -(-rows_out // self.target_rows_per_file))
            outs = write_posdel_files(table, pruned, n_out)
        snap = table.commit_rewrite(
            [d.path for d in dels], outs, operation="replace",
            summary_extra={
                "job": "rewrite-deletes",
                "dv-files-in": len(dels),
                "dv-files-out": len(outs),
                "dv-rows-pruned": rows_in - rows_out,
            },
        )
        record_rewrite_lineage(table, "rewrite-deletes", snap, dels, outs)
        return RewriteDeletesResult(
            snapshot_id=snap.snapshot_id,
            dv_files_in=len(dels),
            dv_files_out=len(outs),
            rows_in=rows_in,
            rows_out=rows_out,
            elapsed_sec=time.time() - t0,
            spill_bytes=spill_metrics(spark),
        )
