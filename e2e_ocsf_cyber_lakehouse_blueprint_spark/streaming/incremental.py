"""Micro-batch incremental pipeline: the engine's Auto Loader / readStream.table.

The reference's ingestion is Auto Loader + SDP ("SDP handles checkpointing and
schema evolution automatically", `_resources/PIPELINE_OVERVIEW.md:165`;
`spark.readStream.format("cloudFiles")`, `bronze_github_audit_logs.py:43-50`;
`spark.readStream.table(...)`, `silver_github_audit_logs.py:27-28`). This
module provides the batch-incremental equivalents:

- ``FileStreamSource``: checkpointed directory listing — each micro-batch
  processes exactly the files not yet committed to the checkpoint (the
  cloudFiles discovery contract, without a long-running stream).
- ``IncrementalTableReader``: reads only data files ADDED since the last
  processed snapshot (the Delta change-feed-of-appends a readStream.table
  sees), by diffing manifest file sets between snapshots — pure metadata.

Exactly-once: the checkpoint commit happens only after the downstream append
snapshot commits; a crash in between reprocesses the batch, and the target
append is idempotent per batch id (batch-id marker in the snapshot summary lets
reruns detect an already-applied batch).

Planned batches are WRITE-AHEAD LOGGED: ``next_batch`` persists the batch's
exact file set (or snapshot span) under ``pending`` in the checkpoint BEFORE
returning it, and re-produces that exact batch after a crash — the same
offsets-log contract as Spark's own FileStreamSource. Without the WAL, a
re-listing heal after a crash-between-commit-and-checkpoint would absorb
files that arrived AFTER the crashed batch into the already-applied batch id,
then mark them processed without ever ingesting them (silent data loss), or —
with ``max_files`` truncation shifting the sorted window — re-ingest the
crashed batch's files under the next id (duplicates).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..format import manifest as mf
from ..format.table import Table


class _Checkpoint:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def read(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def write(self, state: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)


@dataclass
class Batch:
    batch_id: int
    files: list[str]
    df: DataFrame | None


class FileStreamSource:
    """Auto Loader analogue: checkpointed listing of a landing directory."""

    def __init__(self, spark: SparkSession, path: str, checkpoint: str,
                 fmt: str = "json", schema=None, suffix: str | None = None,
                 pattern: str | None = None):
        self.spark = spark
        self.path = path
        self.fmt = fmt
        self.schema = schema
        self.suffix = suffix or {"json": ".json", "parquet": ".parquet", "text": ""}.get(fmt, "")
        self.pattern = pattern  # fnmatch glob on the landing-dir-relative path
        self.cp = _Checkpoint(checkpoint)

    def _list(self) -> list[str]:
        import fnmatch

        out = []
        for root, _d, names in os.walk(self.path):
            for n in names:
                if n.startswith((".", "_")):
                    continue
                if self.suffix and not n.endswith(self.suffix):
                    continue
                p = os.path.join(root, n)
                if self.pattern and not fnmatch.fnmatch(
                        os.path.relpath(p, self.path), self.pattern):
                    continue
                out.append(p)
        return sorted(out)

    def next_batch(self, max_files: int | None = None) -> Batch | None:
        state = self.cp.read()
        pending = state.get("pending")
        if pending:
            # a planned batch was never committed (crash mid-apply):
            # re-produce EXACTLY it, ignoring any files that arrived since
            return Batch(int(pending["batch_id"]), list(pending["files"]),
                         self._read(list(pending["files"])))
        seen = set(state.get("processed", []))
        new = [p for p in self._list() if p not in seen]
        if max_files:
            new = new[:max_files]
        if not new:
            return None
        batch_id = int(state.get("batch_id", -1)) + 1
        # WAL the plan before handing it out (see module doc)
        self.cp.write({**state, "pending": {"batch_id": batch_id, "files": new}})
        return Batch(batch_id, new, self._read(new))

    def _read(self, files: list[str]) -> DataFrame:
        reader = self.spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        if self.fmt == "json":
            return reader.json(files)
        if self.fmt == "parquet":
            return reader.parquet(*files)
        if self.fmt == "text":
            return reader.text(files)
        raise ValueError(self.fmt)

    def commit(self, batch: Batch) -> None:
        state = self.cp.read()
        processed = set(state.get("processed", []))
        processed.update(batch.files)
        self.cp.write({"batch_id": batch.batch_id, "processed": sorted(processed)})


class IncrementalTableReader:
    """readStream.table analogue: new data files since the last seen snapshot."""

    def __init__(self, table: Table, checkpoint: str):
        self.table = table
        self.cp = _Checkpoint(checkpoint)

    def next_batch(self) -> Batch | None:
        self.table.refresh()
        state = self.cp.read()
        pending = state.get("pending")
        if pending:
            # crash mid-apply: re-produce the planned batch verbatim — later
            # commits get their own batch ids after this one lands
            b = Batch(int(pending["batch_id"]), list(pending["files"]),
                      self.table.read_parquet(list(pending["files"])))
            b._snapshot_id = pending["snapshot_id"]  # type: ignore[attr-defined]
            return b
        cur = self.table.current_snapshot()
        if cur is None:
            return None
        last = state.get("last_snapshot_id")
        if last == cur.snapshot_id:
            return None
        prev_files = (
            {f.path for f in self.table.live_data_files(last)} if last is not None else set()
        )
        # append-only sources: new rows live exactly in the added files
        new_files = [
            f for f in self.table.live_data_files(cur.snapshot_id)
            if f.path not in prev_files
        ]
        batch_id = int(state.get("batch_id", -1)) + 1
        if not new_files:
            self.cp.write({"last_snapshot_id": cur.snapshot_id, "batch_id": batch_id})
            return None
        paths = [f.path for f in new_files]
        self.cp.write({**state, "pending": {
            "batch_id": batch_id, "snapshot_id": cur.snapshot_id,
            "files": paths}})
        b = Batch(batch_id, paths, self.table.read_parquet(paths))
        b._snapshot_id = cur.snapshot_id  # type: ignore[attr-defined]
        return b

    def commit(self, batch: Batch) -> None:
        self.cp.write({
            "last_snapshot_id": getattr(batch, "_snapshot_id"),
            "batch_id": batch.batch_id,
        })


class ChangeFeedReader:
    """readStream with full CDC semantics: each batch is the row-level change
    feed (``_change_type`` / ``_commit_snapshot_id``) since the checkpointed
    snapshot. Where IncrementalTableReader handles append-only upstreams,
    this reader also streams DELETE / UPDATE / MERGE effects — the consumer
    (e.g. a silver table keeping itself consistent with a mutating bronze)
    applies them as an idempotent merge keyed on the change columns."""

    def __init__(self, table: Table, checkpoint: str):
        self.table = table
        self.cp = _Checkpoint(checkpoint)

    def next_batch(self) -> Batch | None:
        from ..operators.change_feed import change_feed

        self.table.refresh()
        state = self.cp.read()
        pending = state.get("pending")
        cur = self.table.current_snapshot()
        if pending:
            # crash mid-apply: replay the exact planned snapshot span
            b = Batch(int(pending["batch_id"]), [],
                      change_feed(self.table, pending.get("from_snapshot_id"),
                                  pending["snapshot_id"]))
            b._snapshot_id = pending["snapshot_id"]  # type: ignore[attr-defined]
            return b
        if cur is None:
            return None
        last = state.get("last_snapshot_id")
        if last == cur.snapshot_id:
            return None
        batch_id = int(state.get("batch_id", -1)) + 1
        self.cp.write({**state, "pending": {
            "batch_id": batch_id, "from_snapshot_id": last,
            "snapshot_id": cur.snapshot_id}})
        df = change_feed(self.table, last, cur.snapshot_id)
        b = Batch(batch_id, [], df)
        b._snapshot_id = cur.snapshot_id  # type: ignore[attr-defined]
        return b

    def commit(self, batch: Batch) -> None:
        self.cp.write({
            "last_snapshot_id": getattr(batch, "_snapshot_id"),
            "batch_id": batch.batch_id,
        })


def run_micro_batches(
    source,
    target: Table,
    transform: Callable[[DataFrame], DataFrame] = lambda df: df,
    *,
    max_batches: int = 100,
    n_files: int | None = None,
    upsert_keys: Sequence[str] | None = None,
) -> int:
    """Drain a source into a table; returns batches processed. Exactly-once:
    skip-if-applied via batch-id markers in snapshot summaries, checkpoint
    committed only after the table commit lands.

    ``upsert_keys`` switches each batch from append to the atomic row-delta
    upsert (operators/upsert.py): last-writer-wins by key across batches —
    the streaming CDC-apply pattern — still O(batch) per commit, no target
    rows read. Idempotence is unchanged: the upsert is one snapshot, so the
    batch-id marker covers the delete and the append together."""
    applied = {
        s.summary.get("batch-id")
        for s in target.snapshots
        if s.summary.get("batch-id") is not None
    }
    n = 0
    while n < max_batches:
        batch = source.next_batch()
        if batch is None:
            return n
        if batch.batch_id in applied:
            source.commit(batch)  # crash happened between append and checkpoint
            continue
        out = transform(batch.df)
        if upsert_keys is not None:
            from ..operators.upsert import upsert
            upsert(target, out, upsert_keys, n_files=n_files,
                   summary_extra={"batch-id": batch.batch_id})
        else:
            target.append(out, n_files=n_files,
                          summary_extra={"batch-id": batch.batch_id})
        source.commit(batch)
        n += 1
    return n
