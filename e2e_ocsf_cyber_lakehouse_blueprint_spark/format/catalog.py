"""Lightweight filesystem catalog: warehouse/<db>/<table>.

Replaces the reference's Unity Catalog hierarchy (`utilities/utils.py:10-18`,
CATALOG="grp" + 4 databases; `CREATE DATABASE IF NOT EXISTS`,
`utilities/pre_setup_ocsf_tables.py:65`) with a plain directory layout — the
engine is cloud-agnostic; a real deployment points ``warehouse`` at an object
store prefix.

Name→location indirection (``_catalog.json``): by convention a table named
``db.tbl`` lives at ``warehouse/db/tbl``, but the LOGICAL name is catalog
metadata, not a storage path — manifests and delete files carry absolute
data-file paths (like Iceberg), so ``ALTER TABLE ... RENAME TO`` must never
move bytes. A rename records the new name → existing location in the
catalog file and shadows the old conventional directory; every lookup
(``load_table``/``table_exists``/``list_tables``) resolves through the map
first. This is exactly how HMS/Glue/REST catalogs make rename O(1) at any
table size. The catalog file is single-writer, atomic-replace.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .partition import PartitionSpec
from .table import Table


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)
        self._catalog_file = os.path.join(self.warehouse, "_catalog.json")

    # --------------------------------------------- name->location indirection

    def _mapping(self) -> dict:
        try:
            with open(self._catalog_file) as f:
                m = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            m = {}
        m.setdefault("locations", {})   # logical name -> absolute location
        m.setdefault("shadowed", [])    # conventional dirs occupied by a
        return m                        # renamed-away table (not tables)

    def _write_mapping(self, m: dict) -> None:
        tmp = self._catalog_file + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f, sort_keys=True, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._catalog_file)

    def _conventional_loc(self, name: str) -> str:
        db, _, tbl = name.rpartition(".")
        return os.path.join(self.warehouse, db or "default", tbl)

    def _loc(self, name: str, m: dict | None = None) -> str:
        """Resolved location of ``name``: the catalog map wins, else the
        conventional directory. Pass a preloaded ``m`` to avoid re-reading
        ``_catalog.json`` inside one public operation (an object-store
        warehouse pays a GET per read)."""
        if m is None:
            m = self._mapping()
        return m["locations"].get(self._canon(name),
                                  self._conventional_loc(name))

    @staticmethod
    def _canon(name: str) -> str:
        db, _, tbl = name.rpartition(".")
        return f"{db or 'default'}.{tbl}"

    def create_database(self, db: str) -> None:
        os.makedirs(os.path.join(self.warehouse, db), exist_ok=True)

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        partition_spec: PartitionSpec = PartitionSpec.unpartitioned(),
        properties: dict[str, str] | None = None,
        cluster_keys: Sequence[str] = (),
    ) -> Table:
        loc = self.location_for_new(name)
        try:
            return Table.create(self.spark, loc, schema, partition_spec,
                                properties, cluster_keys)
        except BaseException:
            # a non-conventional location was already recorded in the map;
            # a failed create (e.g. invalid schema) must not leave a
            # dangling entry accumulating in _catalog.json
            m = self._mapping()
            if m["locations"].get(self._canon(name)) == loc \
                    and not os.path.exists(os.path.join(loc, "metadata")):
                del m["locations"][self._canon(name)]
                self._write_mapping(m)
            raise

    def location_for_new(self, name: str) -> str:
        """Allocate (and, when non-conventional, record) a physical location
        for a NEW table named ``name``. The conventional dir is used unless a
        renamed-away table still physically occupies it — then a unique
        sibling dir is allocated and mapped, so re-creating an old name never
        collides with the renamed table's live bytes."""
        m = self._mapping()
        if self.table_exists(name, m):
            raise ValueError(
                f"table {name} already exists at {self._loc(name, m)}")
        conv = self._conventional_loc(name)
        key = self._canon(name)
        if conv not in m["shadowed"] and not os.path.exists(
                os.path.join(conv, "metadata")):
            if key in m["locations"]:
                del m["locations"][key]
                self._write_mapping(m)
            return conv
        loc = f"{conv}__{uuid.uuid4().hex[:8]}"
        m["locations"][key] = loc
        self._write_mapping(m)
        return loc

    def rename_table(self, old: str, new: str) -> None:
        """``ALTER TABLE old RENAME TO new`` — O(1) catalog metadata, zero
        bytes moved (manifests carry absolute paths; the physical location is
        permanent, the logical name is not)."""
        m = self._mapping()
        if not self.table_exists(old, m):
            raise ValueError(f"unknown table {old}")
        if self.table_exists(new, m):
            raise ValueError(f"table {new} already exists")
        loc = self._loc(old, m)
        old_key, new_key = self._canon(old), self._canon(new)
        m["locations"].pop(old_key, None)
        if loc == self._conventional_loc(old):
            # the old conventional dir still physically holds the table
            m["shadowed"] = sorted(set(m["shadowed"]) | {loc})
        if loc != self._conventional_loc(new):
            m["locations"][new_key] = loc
        else:
            m["shadowed"] = sorted(set(m["shadowed"]) - {loc})
        self._write_mapping(m)

    def load_table(self, name: str) -> Table:
        m = self._mapping()
        if not self.table_exists(name, m):
            raise ValueError(f"unknown table {name}")
        return Table.load(self.spark, self._loc(name, m))

    def table_exists(self, name: str, m: dict | None = None) -> bool:
        if m is None:
            m = self._mapping()
        loc = self._loc(name, m)
        if loc == self._conventional_loc(name) and loc in m["shadowed"]:
            return False
        return os.path.exists(os.path.join(loc, "metadata"))

    def list_tables(self, db: str = "default") -> list[str]:
        base = os.path.join(self.warehouse, db)
        m = self._mapping()
        # dirs that are not tables under their own directory name: shadowed
        # (renamed-away) dirs, and physical locations of mapped names (those
        # re-enter below under their LOGICAL name)
        skip = set(m["shadowed"]) | set(m["locations"].values())
        names: set[str] = set()
        if os.path.isdir(base):
            names.update(
                t for t in os.listdir(base)
                if os.path.isdir(os.path.join(base, t, "metadata"))
                and os.path.join(base, t) not in skip
            )
        for key, loc in m["locations"].items():
            d, _, tbl = key.rpartition(".")
            if d == db and os.path.isdir(os.path.join(loc, "metadata")):
                names.add(tbl)
        return sorted(names)

    def drop_table(self, name: str, *, purge: bool = True) -> None:
        """``DROP TABLE``: unregister and (with ``purge``, the default — this
        catalog owns its table locations, Unity 'managed table' semantics)
        delete the data + metadata tree. Refuses unknown names loudly."""
        import shutil

        m = self._mapping()
        if not self.table_exists(name, m):
            raise ValueError(f"unknown table {name}")
        loc = self._loc(name, m)
        if purge:
            shutil.rmtree(loc)
        else:
            # metadata removal alone unregisters; data files remain for
            # external retention tooling
            shutil.rmtree(os.path.join(loc, "metadata"))
        changed = m["locations"].pop(self._canon(name), None) is not None
        # the shadow marked this dir as occupied by a renamed-away TABLE;
        # once no table metadata lives there the original name may reclaim
        # its conventional location — leftover unpurged data files do not
        # pin it (they are unreferenced by any future table's manifests)
        if loc in m["shadowed"] and not os.path.exists(
                os.path.join(loc, "metadata")):
            m["shadowed"] = sorted(set(m["shadowed"]) - {loc})
            changed = True
        if changed:
            self._write_mapping(m)
