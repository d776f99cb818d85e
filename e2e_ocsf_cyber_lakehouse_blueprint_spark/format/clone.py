"""Table cloning — Delta ``CREATE TABLE ... [SHALLOW|DEEP] CLONE`` analogue.

The reference's Databricks platform provides table clones as a managed
service (zero-copy dev/test forks, point-in-time snapshots for audits); this
module implements both flavors over the engine's own manifest format:

* **shallow**: the clone's first snapshot references the source's live files
  in place — pure metadata, O(files) not O(bytes). Copy-on-write applies from
  the very next commit: any rewrite in either table lands in that table's own
  data directory, so the two histories never interfere. The clone's orphan GC
  is safe by construction (``operators/expire.py`` only lists the clone's own
  data dir, so source-owned paths are never delete candidates) — but DROP
  TABLE PURGE / aggressive GC on the SOURCE can still strand a shallow clone,
  exactly Delta's documented caveat.
* **deep**: additionally copies every referenced file into the clone's data
  directory with one distributed executor-side job (one task batch per file
  group — scales with cluster width, the driver only builds the path map).
  Positional-delete files embed absolute data-file paths in their
  ``file_path`` column, so they are REWRITTEN (Arrow read → remap → write)
  rather than byte-copied; equality deletes carry only key values and copy
  verbatim.

Sequence-number invariant: cloned entries keep their source
``data_sequence`` verbatim (the strict ``data_sequence <`` equality-delete
rule must keep ordering source deletes against source data), and the clone's
first snapshot takes ``sequence_number = max(cloned sequences)`` so every
FUTURE commit outranks every cloned file — a post-clone equality delete
applies to all cloned rows, same as Iceberg's sequence semantics after a
snapshot import.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Any

from pyspark.sql import SparkSession

from . import manifest as mf
from . import snapshot as snap
from .table import Table


def _resolve_snapshot(src: Table, snapshot_id: int | None,
                      as_of_timestamp_ms: int | None,
                      ref: str | None) -> snap.Snapshot | None:
    if sum(x is not None for x in (snapshot_id, as_of_timestamp_ms, ref)) > 1:
        raise ValueError(
            "pass at most one of snapshot_id / as_of_timestamp_ms / ref")
    if ref is not None:
        return src.ref_snapshot(ref)
    if as_of_timestamp_ms is not None:
        return src.snapshot_as_of(as_of_timestamp_ms)
    if snapshot_id is not None:
        return src.meta.snapshot_by_id(snapshot_id)
    return src.current_snapshot()


def _dest_rel(src_location: str, path: str) -> str:
    """Clone-relative path for a copied file: keep the source's data-dir
    layout (partition directories and all); files living OUTSIDE the source's
    data dir (e.g. the source is itself a shallow clone) get a digest-prefixed
    flat name so distinct origins can never collide."""
    data_root = os.path.join(src_location, "data") + os.sep
    if path.startswith(data_root):
        return os.path.join("data", path[len(data_root):])
    digest = hashlib.sha1(path.encode("utf-8")).hexdigest()[:12]
    return os.path.join("data", f"ext-{digest}-{os.path.basename(path)}")


def _copy_files_distributed(
    spark: SparkSession, files: list[mf.DataFile], mapping: dict[str, str],
) -> dict[str, int]:
    """Copy every referenced file to its mapped destination on the executors;
    positional-delete files are rewritten with their ``file_path`` column
    remapped through the (broadcast) path map. Returns {src: dest size} so
    the caller can re-stamp rewritten files' ``file_size_bytes``."""
    rows = [(f.path, mapping[f.path], f.content == "posdel") for f in files]
    bmap = spark.sparkContext.broadcast(mapping)
    n_slices = max(1, min(len(rows), spark.sparkContext.defaultParallelism * 2))

    def work(it):
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        m = bmap.value
        for src_path, dst, is_posdel in it:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if is_posdel:
                t = pq.read_table(src_path)
                idx = t.schema.get_field_index("file_path")
                remapped = pa.array(
                    [m.get(p, p) for p in t.column(idx).to_pylist()],
                    type=pa.string())
                t = t.set_column(idx, "file_path", remapped)
                pq.write_table(t, dst)
            else:
                shutil.copyfile(src_path, dst)
            yield (src_path, os.path.getsize(dst))

    out = spark.sparkContext.parallelize(rows, n_slices).mapPartitions(work).collect()
    return dict(out)


def clone_table(
    src: Table,
    dest_location: str,
    *,
    deep: bool = False,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
    ref: str | None = None,
) -> Table:
    """Clone ``src`` (optionally at a point in time) into ``dest_location``.

    Version resolution follows the SQL dialect's conventions (``VERSION AS
    OF`` = snapshot id, ``TIMESTAMP AS OF`` along main's ancestry, ``AT
    BRANCH|TAG`` via named refs). The clone starts with one ``clone``
    snapshot holding the source's live data + delete files at that point;
    schema, partition spec, properties, and cluster keys are copied from the
    source's current metadata.
    """
    src.refresh()
    s = _resolve_snapshot(src, snapshot_id, as_of_timestamp_ms, ref)
    files = [dataclasses.replace(f)
             for f in src._live_files(s.snapshot_id if s else None, None)]

    dest = Table.create(
        src.spark, dest_location, src.schema, src.spec,
        properties=dict(src.meta.properties),
        cluster_keys=list(src.meta.cluster_keys),
    )

    if deep and files:
        mapping = {
            f.path: os.path.join(dest.location, _dest_rel(src.location, f.path))
        for f in files}
        if len(set(mapping.values())) != len(mapping):
            raise ValueError("deep clone path mapping collision")
        sizes = _copy_files_distributed(src.spark, files, mapping)
        files = [
            dataclasses.replace(
                f, path=mapping[f.path],
                file_size_bytes=(sizes[f.path] if f.content == "posdel"
                                 else f.file_size_bytes),
                covered_paths=[mapping.get(p, p) for p in f.covered_paths],
            )
            for f in files
        ]

    if s is None:
        return dest  # empty source: the clone is just the created table

    src_seq_max = max((f.data_sequence for f in files), default=0)

    def build(meta: snap.TableMetadata) -> tuple[snap.Snapshot, Any]:
        sid, parent_id, seq = dest._next_ids(meta)
        # future commits must outrank every cloned sequence (see module doc)
        seq = max(seq, src_seq_max)
        mpath = dest._new_manifest_path()
        record = mf.write_manifest(mpath, files, sid, mf.STATUS_ADDED)
        mlist = dest._manifest_list_path(sid)
        mf.write_manifest_list(mlist, [record])
        summary = {
            "clone-source": src.location,
            "clone-source-snapshot-id": s.snapshot_id,
            "clone-depth": "deep" if deep else "shallow",
            "added-data-files": sum(1 for f in files if f.content == "data"),
            "added-records": sum(f.record_count for f in files
                                 if f.content == "data"),
        }
        return snap.Snapshot(sid, parent_id, seq, snap.now_ms(), "clone",
                             mlist, summary), None

    dest._commit(build)
    return dest
