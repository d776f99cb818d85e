"""Lightweight filesystem catalog: warehouse/<db>/<table>.

Replaces the reference's Unity Catalog hierarchy (`utilities/utils.py:10-18`,
CATALOG="grp" + 4 databases; `CREATE DATABASE IF NOT EXISTS`,
`utilities/pre_setup_ocsf_tables.py:65`) with a plain directory layout — the
engine is cloud-agnostic; a real deployment points ``warehouse`` at an object
store prefix.
"""

from __future__ import annotations

import os
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

    def _loc(self, name: str) -> str:
        db, _, tbl = name.rpartition(".")
        return os.path.join(self.warehouse, db or "default", tbl)

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
        loc = self._loc(name)
        if self.table_exists(name):
            raise ValueError(f"table {name} already exists at {loc}")
        return Table.create(self.spark, loc, schema, partition_spec, properties, cluster_keys)

    def load_table(self, name: str) -> Table:
        return Table.load(self.spark, self._loc(name))

    def table_exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._loc(name), "metadata"))

    def list_tables(self, db: str = "default") -> list[str]:
        base = os.path.join(self.warehouse, db)
        if not os.path.isdir(base):
            return []
        return sorted(
            t for t in os.listdir(base)
            if os.path.isdir(os.path.join(base, t, "metadata"))
        )

    def drop_table(self, name: str, *, purge: bool = True) -> None:
        """``DROP TABLE``: unregister and (with ``purge``, the default — this
        catalog owns its table locations, Unity 'managed table' semantics)
        delete the data + metadata tree. Refuses unknown names loudly."""
        import shutil

        if not self.table_exists(name):
            raise ValueError(f"unknown table {name}")
        loc = self._loc(name)
        if purge:
            shutil.rmtree(loc)
        else:
            # metadata removal alone unregisters; data files remain for
            # external retention tooling
            shutil.rmtree(os.path.join(loc, "metadata"))
