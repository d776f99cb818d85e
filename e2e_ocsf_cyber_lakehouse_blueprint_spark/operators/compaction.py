"""Bin-packing small-file compaction (FFD) — the auto-compaction the reference
delegates to Delta (`delta.autoOptimize.autoCompact`, `utilities/utils.py:87`;
`pipelines.autoOptimize.managed`, `:88`), built as an explicit, resumable job.

Plan (driver-side Python, metadata only):
  census live files per partition -> pick small files -> first-fit-decreasing
  pack into target-size bins -> one rewrite task per partition.

Execute (Spark, per partition, concurrent):
  read input files -> repartitionByRange(n_bins, sort_keys) ->
  sortWithinPartitions(sort_keys) -> write n_bins files -> harvest stats.
  Range partitioning on (conv_id, turn_idx) keeps conversations contiguous in
  output files (the scan-order invariant) and balances bins by rows even when
  input files are skewed.

Commit (driver): ONE copy-on-write snapshot replacing all rewritten files —
readers pinned to the old snapshot are untouched (snapshot isolation), and a
crash before commit leaves the table unchanged while the ledger lets the rerun
reuse every finished partition.
"""

from __future__ import annotations

import os
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from ..format.manifest import DataFile
from ..format.stats import harvest_file_stats
from ..format.table import Table
from .ledger import Ledger, partition_key, spill_metrics, split_size_for_rewrites

DEFAULT_TARGET_FILE_SIZE = 128 * 1024 * 1024


def ffd_pack(items: list[tuple[str, int]], capacity: int) -> list[list[str]]:
    """First-fit-decreasing bin packing of (id, size) items into capacity bins.

    Items larger than capacity get a dedicated bin. Returns bins as id lists.
    """
    bins: list[tuple[int, list[str]]] = []  # (used, ids)
    for item_id, size in sorted(items, key=lambda x: (-x[1], x[0])):
        placed = False
        for i, (used, ids) in enumerate(bins):
            if used + size <= capacity:
                bins[i] = (used + size, ids + [item_id])
                placed = True
                break
        if not placed:
            bins.append((size, [item_id]))
    return [ids for _, ids in bins]


@dataclass
class PartitionCompactionPlan:
    partition: dict[str, str | None]
    input_files: list[DataFile]
    n_output_files: int

    @property
    def key(self) -> str:
        return partition_key(self.partition)


@dataclass
class CompactionResult:
    snapshot_id: int | None
    partitions: int
    files_in: int
    files_out: int
    rows: int
    bytes_in: int
    bytes_out: int
    skipped_resume: int = 0
    elapsed_sec: float = 0.0
    spill_bytes: int = 0


def plan_compaction(
    table: Table,
    *,
    target_file_size: int,
    small_file_ratio: float = 0.75,
    min_input_files: int = 2,
) -> list[PartitionCompactionPlan]:
    """Census + FFD pack per partition. Pure metadata — no data read."""
    by_partition: dict[str, list[DataFile]] = {}
    parts: dict[str, dict] = {}
    for f in table.live_data_files():
        k = partition_key(f.partition)
        by_partition.setdefault(k, []).append(f)
        parts[k] = f.partition
    plans = []
    threshold = int(target_file_size * small_file_ratio)
    for k, files in sorted(by_partition.items()):
        small = [f for f in files if f.file_size_bytes < threshold]
        if len(small) < min_input_files:
            continue
        bins = ffd_pack([(f.path, f.file_size_bytes) for f in small], target_file_size)
        if len(bins) >= len(small):
            continue  # nothing to gain: every file already ~target-sized
        plans.append(PartitionCompactionPlan(parts[k], small, len(bins)))
    return plans


class CompactionJob:
    """Resumable bin-packing compaction over one table.

    At 100TB scale: each partition rewrite is an independent Spark job over only
    that partition's small files; `max_concurrency` bounds how many run at once
    (the driver threads only schedule — all data movement is executor-side).
    The final commit is one metadata operation regardless of data volume.
    """

    def __init__(
        self,
        table: Table,
        *,
        target_file_size: int | None = None,
        sort_keys: tuple[str, ...] = ("conv_id", "turn_idx"),
        small_file_ratio: float = 0.75,
        min_input_files: int = 2,
        max_concurrency: int = 8,
    ):
        self.table = table
        self.target_file_size = target_file_size or table.property_int(
            "write.target-file-size-bytes", DEFAULT_TARGET_FILE_SIZE
        )
        self.sort_keys = sort_keys
        self.small_file_ratio = small_file_ratio
        self.min_input_files = min_input_files
        self.max_concurrency = max_concurrency

    def _rewrite_partition(self, plan: PartitionCompactionPlan, job_tag: str) -> list[DataFile]:
        spark = self.table.spark
        paths = [f.path for f in plan.input_files]
        df = spark.read.schema(self.table.schema).parquet(*paths)
        n = max(1, plan.n_output_files)
        if n > 1:
            df = df.repartitionByRange(n, *self.sort_keys)
        else:
            df = df.coalesce(1)
        df = df.sortWithinPartitions(*self.sort_keys)
        out_dir = os.path.join(
            self.table.location, "data", f"{job_tag}-{uuid.uuid4().hex[:12]}"
        )
        df.write.mode("error").parquet(out_dir)
        files = harvest_file_stats(spark, out_dir, self.table.schema, [],
                                   self.table.hash_stat_columns(),
                                   self.table.stat_columns())
        # rewrites stay inside one partition: stamp its values onto the outputs
        for f in files:
            f.partition = dict(plan.partition)
        return files

    def run(self, *, resume: bool = True, dry_run: bool = False) -> CompactionResult:
        t0 = time.time()
        self.table.refresh()
        snapshot = self.table.current_snapshot()
        if snapshot is None:
            return CompactionResult(None, 0, 0, 0, 0, 0, 0)
        plans = plan_compaction(
            self.table,
            target_file_size=self.target_file_size,
            small_file_ratio=self.small_file_ratio,
            min_input_files=self.min_input_files,
        )
        if dry_run or not plans:
            return CompactionResult(
                snapshot.snapshot_id, len(plans),
                sum(len(p.input_files) for p in plans),
                sum(p.n_output_files for p in plans),
                0, 0, 0, elapsed_sec=time.time() - t0,
            )
        job_id = f"compact-{snapshot.snapshot_id}"
        ledger = Ledger(self.table.location, job_id, "compact")
        done = ledger.completed_partitions() if resume else {}
        skipped = 0

        def work(plan: PartitionCompactionPlan) -> tuple[PartitionCompactionPlan, list[DataFile], bool]:
            nonlocal skipped
            rec = done.get(plan.key)
            if rec is not None and sorted(rec["input_files"]) == sorted(
                f.path for f in plan.input_files
            ):
                return plan, Ledger.output_data_files(rec), True
            started = int(time.time() * 1000)
            outs = self._rewrite_partition(plan, job_id)
            ledger.record_partition(
                plan.partition,
                [f.path for f in plan.input_files],
                outs,
                rows=sum(f.record_count for f in outs),
                bytes_written=sum(f.file_size_bytes for f in outs),
                spill_bytes=spill_metrics(self.table.spark),
                started_ms=started,
            )
            return plan, outs, False

        with split_size_for_rewrites(self.table.spark, self.target_file_size):
            with ThreadPoolExecutor(max_workers=self.max_concurrency) as pool:
                results = list(pool.map(work, plans))

        deleted, added = [], []
        for plan, outs, was_resumed in results:
            if was_resumed:
                skipped += 1
            deleted.extend(f.path for f in plan.input_files)
            added.extend(outs)
        snap = self.table.commit_rewrite(
            deleted, added, operation="replace",
            summary_extra={"job": "compact", "job-id": job_id},
        )
        ledger.record_job_done({"snapshot_id": snap.snapshot_id})
        return CompactionResult(
            snapshot_id=snap.snapshot_id,
            partitions=len(plans),
            files_in=len(deleted),
            files_out=len(added),
            rows=sum(f.record_count for f in added),
            bytes_in=sum(f.file_size_bytes for p in plans for f in p.input_files),
            bytes_out=sum(f.file_size_bytes for f in added),
            skipped_resume=skipped,
            elapsed_sec=time.time() - t0,
            spill_bytes=spill_metrics(self.table.spark),
        )
