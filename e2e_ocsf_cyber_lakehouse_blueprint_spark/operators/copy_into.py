"""``COPY INTO`` — idempotent batch file ingestion (Databricks analogue).

The reference ingests with Auto Loader streams
(`transformations/pipelines/bronze_ocsf_iam_sources_dlt.py`); ``COPY INTO``
is the batch sibling its platform offers for the same landing-directory
pattern: every invocation loads exactly the files not yet ingested, and a
re-run after success is a no-op. This implementation reuses the engine's
checkpointed ``FileStreamSource`` (streaming/incremental.py) with the
checkpoint living INSIDE the target table's metadata tree, keyed by the
source directory — so each (table, source) pair has its own independent
ingestion ledger and concurrent COPY INTO from different sources never
collide.

Exactly-once across crashes uses the same two-marker protocol as
``run_micro_batches``: the table commit carries a source-scoped batch marker
in its snapshot summary, and the checkpoint advances only AFTER the commit
lands. A crash between the two is healed on the next run by skipping batches
whose marker already appears in the snapshot log (the marker embeds the
source key, so multi-source ingestion cannot alias batch ids).

Scale shape: the driver only lists the landing directory and diffs it
against the checkpoint (O(files) metadata); the data path is the table's
standard distributed append (stats harvest and all). ``max_files_per_batch``
bounds a single commit's manifest growth on huge backlogs.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from ..format.table import Table
from ..streaming.incremental import FileStreamSource


@dataclass
class CopyIntoResult:
    batches: int
    files: int
    rows: int
    skipped_batches: int  # healed crash leftovers (already-committed markers)


def copy_into(
    table: Table,
    source: str,
    *,
    file_format: str = "parquet",
    pattern: str | None = None,
    schema=None,
    max_files_per_batch: int | None = None,
    n_files: int | None = None,
) -> CopyIntoResult:
    """Load every not-yet-ingested file under ``source`` into ``table``."""
    source = os.path.abspath(source)
    src_key = hashlib.sha1(
        f"{source}|{file_format}|{pattern or ''}".encode("utf-8")
    ).hexdigest()[:16]
    checkpoint = os.path.join(
        table.location, "metadata", "copy-into", src_key)
    fss = FileStreamSource(
        table.spark, source, checkpoint, fmt=file_format,
        schema=schema, pattern=pattern)

    applied = {
        s.summary.get("copy-into-batch")
        for s in table.snapshots
        if s.summary.get("copy-into-batch", "").startswith(src_key + ":")
    }

    batches = files = rows = skipped = 0
    while True:
        batch = fss.next_batch(max_files=max_files_per_batch)
        if batch is None:
            break
        marker = f"{src_key}:{batch.batch_id}"
        if marker in applied:
            # crash landed the commit but not the checkpoint: heal and move on
            fss.commit(batch)
            skipped += 1
            continue
        snapshot = table.append(batch.df, n_files=n_files, summary_extra={
            "copy-into-batch": marker,
            "copy-into-source": source,
            "copy-into-files": len(batch.files),
        })
        fss.commit(batch)
        batches += 1
        files += len(batch.files)
        rows += int(snapshot.summary.get("added-records", 0))
    return CopyIntoResult(batches, files, rows, skipped)
