"""Snapshot chain + atomic metadata commits (the engine's ACID layer).

Replaces the Delta transaction log the reference leans on
(`_resources/PIPELINE_OVERVIEW.md:319` "Delta Lake - ACID transactions");
the concurrent-writer race its setup scripts dodge with minimal-schema
pre-creation (`utilities/pre_setup_ocsf_tables.py:77-82`) is handled here with
optimistic concurrency: metadata version files are created with ``os.link``
(fails with EEXIST if a concurrent writer won), and losers rebase and retry.

Readers pin a snapshot id; the file set they resolve is immutable, giving
snapshot isolation for free. ``version-hint.text`` is only a hint — loads fall
back to scanning for the max version.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field


@dataclass
class Snapshot:
    snapshot_id: int
    parent_snapshot_id: int | None
    sequence_number: int
    timestamp_ms: int
    operation: str  # append | replace | overwrite | delete | expire
    manifest_list: str
    summary: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_snapshot_id": self.parent_snapshot_id,
            "sequence_number": self.sequence_number,
            "timestamp_ms": self.timestamp_ms,
            "operation": self.operation,
            "manifest_list": self.manifest_list,
            "summary": self.summary,
        }

    @staticmethod
    def from_dict(d: dict) -> "Snapshot":
        return Snapshot(
            d["snapshot_id"], d.get("parent_snapshot_id"), d["sequence_number"],
            d["timestamp_ms"], d["operation"], d["manifest_list"], d.get("summary", {}),
        )


@dataclass
class TableMetadata:
    table_uuid: str
    location: str
    schema_json: dict
    partition_spec: list[dict]
    properties: dict[str, str]
    snapshots: list[Snapshot]
    current_snapshot_id: int | None
    version: int
    cluster_keys: list[str] = field(default_factory=list)
    # named refs (Iceberg branches/tags): {name: {"snapshot_id": int,
    # "type": "branch"|"tag"}}. "main" is implicit (current_snapshot_id).
    refs: dict[str, dict] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "format_version": 1,
            "table_uuid": self.table_uuid,
            "location": self.location,
            "schema": self.schema_json,
            "partition_spec": self.partition_spec,
            "properties": self.properties,
            "snapshots": [s.to_dict() for s in self.snapshots],
            "current_snapshot_id": self.current_snapshot_id,
            "version": self.version,
            "cluster_keys": self.cluster_keys,
            "refs": self.refs,
        }

    @staticmethod
    def from_dict(d: dict) -> "TableMetadata":
        return TableMetadata(
            table_uuid=d["table_uuid"],
            location=d["location"],
            schema_json=d["schema"],
            partition_spec=d["partition_spec"],
            properties=d.get("properties", {}),
            snapshots=[Snapshot.from_dict(s) for s in d.get("snapshots", [])],
            current_snapshot_id=d.get("current_snapshot_id"),
            version=d["version"],
            cluster_keys=d.get("cluster_keys", []),
            refs=d.get("refs", {}),
        )

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise KeyError(f"snapshot {snapshot_id} not found")

    def current_snapshot(self) -> Snapshot | None:
        if self.current_snapshot_id is None:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)

    def ancestry(self, head_id: int | None = None) -> list[Snapshot]:
        """Snapshots on the parent chain of ``head_id`` (default: current),
        oldest -> newest — Iceberg's snapshot-log walk.

        The flat ``snapshots`` list also holds staged (WAP) and branch-only
        commits that were never the table's visible state on this line of
        history; time travel and the change feed must resolve along ancestry
        so an abandoned branch or unpublished stage never surfaces. The walk
        stops quietly where expiration truncated the chain (parent id no
        longer in the log)."""
        head = (self.current_snapshot() if head_id is None
                else self.snapshot_by_id(head_id))
        chain: list[Snapshot] = []
        node = head
        while node is not None:
            chain.append(node)
            if node.parent_snapshot_id is None:
                break
            try:
                node = self.snapshot_by_id(node.parent_snapshot_id)
            except KeyError:  # ancestry truncated by snapshot expiration
                break
        chain.reverse()
        return chain


def metadata_dir(location: str) -> str:
    return os.path.join(location, "metadata")


def _version_path(location: str, version: int) -> str:
    return os.path.join(metadata_dir(location), f"v{version}.metadata.json")


def read_version_hint(location: str) -> int | None:
    hint = os.path.join(metadata_dir(location), "version-hint.text")
    try:
        with open(hint) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def latest_version(location: str) -> int | None:
    """Resolve the newest committed metadata version (hint + forward scan)."""
    v = read_version_hint(location) or 0
    if v and not os.path.exists(_version_path(location, v)):
        v = 0
    best = v if v else None
    probe = (v or 0) + 1
    while os.path.exists(_version_path(location, probe)):
        best = probe
        probe += 1
    return best


def load_metadata(location: str) -> TableMetadata:
    v = latest_version(location)
    if v is None:
        raise FileNotFoundError(f"no table metadata at {location}")
    with open(_version_path(location, v)) as f:
        return TableMetadata.from_dict(json.load(f))


def commit_metadata(meta: TableMetadata) -> None:
    """Atomically publish metadata as the next version.

    Raises FileExistsError if a concurrent writer committed the same version
    first — the caller rebases on the fresh metadata and retries.
    """
    mdir = metadata_dir(meta.location)
    os.makedirs(mdir, exist_ok=True)
    final = _version_path(meta.location, meta.version)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(meta.to_dict(), f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)  # atomic create-if-absent on POSIX
    finally:
        os.unlink(tmp)
    hint_tmp = os.path.join(mdir, f".hint-{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as f:
        f.write(str(meta.version))
    os.replace(hint_tmp, os.path.join(mdir, "version-hint.text"))


def now_ms() -> int:
    return int(time.time() * 1000)
