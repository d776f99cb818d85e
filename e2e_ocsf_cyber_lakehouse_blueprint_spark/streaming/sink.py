"""Structured-Streaming sink into engine tables — exactly-once foreachBatch.

The reference's gold tables are Delta SINKS fed by streaming flows
(`sdp.create_sink`, `transformations/mappings/ocsf/iam/
gold_ocsf_iam_event_classes_delta_sinks.py:117-179`) with the platform
guaranteeing idempotent micro-batch commits. This module is that surface
for a real `writeStream`: :func:`table_sink` returns a ``foreachBatch``
function that commits each micro-batch to an engine table as ONE snapshot
carrying ``(stream-id, stream-batch-id)`` markers, and skips batches whose
marker already exists — so Spark's replay of an epoch after a crash
between the table commit and the streaming checkpoint write lands exactly
once. The pull-based twin (checkpointed batch drains) is
``streaming/incremental.run_micro_batches``; the marker discipline is the
same.

Two commit shapes:

- **append** (default): append-only flows — raw ingest, or append-mode
  finalized windows from :func:`streaming.window_agg.windowed_agg_stream`.
- **upsert** (``upsert_keys``): last-writer-wins row-delta commit
  (`operators/upsert.py`) — update-mode aggregations where a (key, window)
  row is re-emitted as it grows; the engine table converges to the final
  rollup without the sink ever reading it. O(batch) per commit either way.

Scale shape: the sink adds zero plan nodes to the streaming query — the
batch DataFrame goes straight into the table's ordinary write path
(target-size splits, stats harvest, optimistic commit), and the marker
check is a driver-side walk of the snapshot summaries.

Marker retention: snapshot expiration can discard the snapshots carrying
old markers, but Spark's streaming checkpoint only ever replays the LAST
unacknowledged epoch, which is always newer than anything expiration may
retire (expire keeps the most recent snapshots) — so dedup never depends
on markers older than the streaming checkpoint itself.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

from ..format.table import Table

STREAM_ID_KEY = "stream-id"
STREAM_BATCH_KEY = "stream-batch-id"


def applied_batches(table: Table, stream_id: str) -> set[int]:
    """Epoch ids this stream has already committed to ``table``."""
    return {
        int(s.summary[STREAM_BATCH_KEY])
        for s in table.refresh().snapshots
        if s.summary.get(STREAM_ID_KEY) == stream_id
        and s.summary.get(STREAM_BATCH_KEY) is not None
    }


def table_sink(
    target: Table,
    stream_id: str,
    *,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    upsert_keys: Sequence[str] | None = None,
    n_files: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch(df, epoch_id)`` function committing to ``target``
    exactly once per (stream_id, epoch_id). ``stream_id`` namespaces the
    markers so several independent streams can feed one table (the
    reference's 15-flow fan-in shape) without colliding epoch counters."""

    def apply(df: DataFrame, epoch_id: int) -> None:
        t = target.refresh()
        if int(epoch_id) in applied_batches(t, stream_id):
            return  # replay after a crash past the commit: already applied
        out = transform(df) if transform is not None else df
        if out.isEmpty():
            return  # empty epochs commit nothing; replaying them is free
        summary = {STREAM_ID_KEY: stream_id,
                   STREAM_BATCH_KEY: str(int(epoch_id))}
        if upsert_keys is not None:
            from ..operators.upsert import upsert

            upsert(t, out, upsert_keys, n_files=n_files,
                   summary_extra=summary)
        else:
            t.append(out, n_files=n_files, summary_extra=summary)

    return apply


def write_stream_to_table(
    stream_df: DataFrame,
    target: Table,
    checkpoint: str,
    stream_id: str,
    *,
    output_mode: str = "append",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    upsert_keys: Sequence[str] | None = None,
    n_files: int | None = None,
):
    """Start ``stream_df`` writing into ``target``; returns the
    StreamingQuery. ``output_mode="update"`` + ``upsert_keys`` is the
    continuously-updated rollup shape; ``"append"`` the finalized-rows
    shape."""
    return (
        stream_df.writeStream
        .foreachBatch(table_sink(target, stream_id, transform=transform,
                                 upsert_keys=upsert_keys, n_files=n_files))
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )
