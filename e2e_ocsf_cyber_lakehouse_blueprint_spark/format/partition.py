"""Partition spec: transform-based partitioning (identity / days / bucket / truncate).

The reference clusters bronze/silver by `_event_date`
(`transformations/pipelines/github/audit_logs/bronze_github_audit_logs.py:32`) and
gold by `time` (`utilities/post_setup_ocsf_tables.py:44`); its partitioning is
implicit in Delta. Our engine partitions explicitly per BASELINE.md:
``days(ts) x bucket(conv_id, N)`` so that (a) time-range queries prune on the
date dimension and (b) conversations co-locate for MERGE / clustering without
one hot conv dominating a partition.

Derived partition columns are named ``_p_<name>`` and exist only during writes
(Spark's ``partitionBy`` hoists them into the directory structure, so data files
keep the logical schema only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PARTITION_COL_PREFIX = "_p_"


@dataclass(frozen=True)
class PartitionField:
    name: str          # partition field name, e.g. "ts_day", "conv_bucket"
    source: str        # source column
    transform: str     # identity | days | bucket[N] | truncate[W]

    def to_dict(self) -> dict:
        return {"name": self.name, "source": self.source, "transform": self.transform}

    @staticmethod
    def from_dict(d: dict) -> "PartitionField":
        return PartitionField(d["name"], d["source"], d["transform"])

    @property
    def column_name(self) -> str:
        return PARTITION_COL_PREFIX + self.name

    def _param(self) -> int:
        return int(self.transform[self.transform.index("[") + 1 : -1])

    def expr(self) -> Column:
        """Spark expression computing the partition value as a STRING.

        Strings keep the directory layout / manifest encoding uniform; ordering
        is restored per-type at prune time.
        """
        c = F.col(self.source)
        if self.transform == "identity":
            return c.cast("string")
        if self.transform == "days":
            return F.date_format(c, "yyyy-MM-dd")
        if self.transform.startswith("bucket["):
            n = self._param()
            return F.pmod(F.xxhash64(c.cast("string")), F.lit(n)).cast("string")
        if self.transform.startswith("truncate["):
            w = self._param()
            return F.substring(c.cast("string"), 1, w)
        raise ValueError(f"unknown transform: {self.transform}")

    def apply_python(self, value: Any) -> str | None:
        """Driver-side transform of a literal (for partition pruning of = predicates)."""
        import datetime

        if value is None:
            return None
        if self.transform == "identity":
            return str(value)
        if self.transform == "days":
            if isinstance(value, str):
                return value[:10]
            if isinstance(value, (datetime.datetime, datetime.date)):
                return value.strftime("%Y-%m-%d")
            return None
        if self.transform.startswith("truncate["):
            return str(value)[: self._param()]
        if self.transform.startswith("bucket[") and isinstance(value, str):
            # functions/xxh64.py reproduces Spark's xxhash64 bit-for-bit, so
            # bucket pruning of = / IN predicates works driver-side too
            # (Python % on a negative hash == Spark pmod)
            from ..functions.xxh64 import spark_xxhash64_string

            return str(spark_xxhash64_string(value) % self._param())
        return None


@dataclass(frozen=True)
class PartitionSpec:
    fields: tuple[PartitionField, ...] = ()

    @staticmethod
    def unpartitioned() -> "PartitionSpec":
        return PartitionSpec(())

    @staticmethod
    def of(*fields: PartitionField) -> "PartitionSpec":
        return PartitionSpec(tuple(fields))

    def to_list(self) -> list[dict]:
        return [f.to_dict() for f in self.fields]

    @staticmethod
    def from_list(lst: list[dict]) -> "PartitionSpec":
        return PartitionSpec(tuple(PartitionField.from_dict(d) for d in lst))

    @property
    def column_names(self) -> list[str]:
        return [f.column_name for f in self.fields]

    def with_partition_columns(self, df: DataFrame) -> DataFrame:
        if not self.fields:
            return df
        return df.withColumns({f.column_name: f.expr() for f in self.fields})


def days(name: str, source: str) -> PartitionField:
    return PartitionField(name, source, "days")


def bucket(name: str, source: str, n: int) -> PartitionField:
    return PartitionField(name, source, f"bucket[{n}]")


def identity(name: str, source: str) -> PartitionField:
    return PartitionField(name, source, "identity")


def truncate(name: str, source: str, width: int) -> PartitionField:
    return PartitionField(name, source, f"truncate[{width}]")
