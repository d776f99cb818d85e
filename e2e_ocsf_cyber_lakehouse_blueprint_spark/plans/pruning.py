"""Manifest min/max + partition pruning — the engine's data-skipping planner.

Equivalent of the file-level skipping Delta's liquid clustering provides the
reference ("optimizes time-based queries like 'last 7 days'",
`utilities/post_setup_ocsf_tables.py:25-29,78-81`), done here in driver-side
Python BEFORE DataFrame construction: predicates filter manifest entries, and
only surviving file paths reach `spark.read.parquet`. Catalyst still applies
the same predicates as residual filters + parquet row-group pushdown, so
pruning is a pure performance layer — correctness never depends on it.

Predicates are conjunctive triples ``(column, op, value)`` with op in
``= < <= > >= in notnull isnull``.
"""

from __future__ import annotations

import datetime
import json
from typing import Any, Iterable, Sequence

from pyspark.sql import types as T

from ..format.bloom import bloom_key, bloom_might_contain
from ..format.manifest import DataFile, decode_bound
from ..format.partition import PartitionSpec
from ..functions.xxh64 import spark_xxhash64_string

Predicate = tuple[str, str, Any]

_STRINGLY = (T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType)


def _norm_value(value: Any, dtype: T.DataType | None) -> Any:
    if isinstance(value, (datetime.datetime, datetime.date)):
        return str(value)
    if dtype is not None and isinstance(dtype, _STRINGLY):
        return str(value)
    return value


def _stat_name(f: DataFile, col: str, names: Sequence[str] | None) -> str:
    """The name this FILE records stats under for logical column ``col``:
    a file written before a RENAME COLUMN keeps the era's name, so stats
    lookups walk the historical names (newest first) and use the first one
    the file actually has bounds/nulls/blooms for."""
    if not names:
        return col
    for n in names:
        if (n in f.lower_bounds or n in f.null_counts
                or bloom_key(n) in f.blooms):
            return n
    return col


def _survives_bloom(f: DataFile, col: str, op: str, value: Any) -> bool:
    """Per-file bloom bitset (format/bloom.py): definite-absence proof for
    point lookups on files whose min/max AND hash bounds stay wide (fresh
    time-ordered appends). Consulted LAST — only for files every cheaper
    check kept — because probing costs substring searches over the sparse
    encoding. False positives only cost a read."""
    if op not in ("=", "in"):
        return True
    bl = f.blooms.get(bloom_key(col))
    if bl is None:
        return True
    vals = list(value) if op == "in" else [value]
    if not all(isinstance(v, str) for v in vals):
        return True
    return any(bloom_might_contain(bl, v) for v in vals)


def _survives_bounds(f: DataFile, col: str, op: str, value: Any,
                     dtype: T.DataType | None,
                     alias_names: Sequence[str] | None = None) -> bool:
    """False only when the predicate is provably unsatisfiable for this file."""
    col = _stat_name(f, col, alias_names)
    nc = f.null_counts.get(col)
    if op == "isnull":
        return nc is None or nc > 0
    if nc is not None and nc == f.record_count:
        return False  # all-null column cannot satisfy any non-null comparison
    if op == "notnull":
        return True
    # derived xxh64 bounds: hash-ordered files (Z-order conv dimension) keep
    # wide string bounds, but equality predicates prune via the hash range
    if op in ("=", "in"):
        hkey = f"xxh64({col})"
        hlo_s, hhi_s = f.lower_bounds.get(hkey), f.upper_bounds.get(hkey)
        if hlo_s is not None and hhi_s is not None:
            vals = list(value) if op == "in" else [value]
            if all(isinstance(v, str) for v in vals):
                hlo, hhi = decode_bound(hlo_s), decode_bound(hhi_s)
                if not any(hlo <= spark_xxhash64_string(v) <= hhi for v in vals):
                    return False
    lo_s, hi_s = f.lower_bounds.get(col), f.upper_bounds.get(col)
    if lo_s is None or hi_s is None:
        return _survives_bloom(f, col, op, value)  # no stats -> bloom only
    lo, hi = decode_bound(lo_s), decode_bound(hi_s)
    try:
        if op == "in":
            vals = [_norm_value(v, dtype) for v in value]
            return (any(lo <= v <= hi for v in vals)
                    and _survives_bloom(f, col, op, value))
        v = _norm_value(value, dtype)
        if op == "=":
            return lo <= v <= hi and _survives_bloom(f, col, op, value)
        if op == "<":
            return lo < v
        if op == "<=":
            return lo <= v
        if op == ">":
            return hi > v
        if op == ">=":
            return hi >= v
    except TypeError:
        # incomparable types -> bounds can't decide; the bloom still can
        return _survives_bloom(f, col, op, value)
    return True


def covers_bounds(f: DataFile, col: str, op: str, value: Any,
                  dtype: T.DataType | None,
                  alias_names: Sequence[str] | None = None) -> bool:
    """True only when EVERY row of this file provably satisfies the
    predicate — the dual of :func:`_survives_bounds` ("some row may match").
    This is what lets metadata-only aggregation (plans/agg_pushdown.py)
    answer COUNT/MIN/MAX for a file without reading it.

    Sound under Iceberg-style string-bound truncation (manifest.py
    truncate_lower/truncate_upper): the stored lower bound is <= the true
    min and the stored upper bound is >= the true max, so
    ``hi <= v`` still proves ``max <= v`` and ``lo > v`` still proves
    ``min > v``. For equality, ``lo == hi == v`` implies the upper bound was
    NOT truncated (truncation increments a character, forcing hi > lo), so
    both bounds are exact and every row equals ``v``.
    """
    name = _stat_name(f, col, alias_names)
    nc = f.null_counts.get(name)
    if op == "isnull":
        return nc is not None and nc == f.record_count
    if op == "notnull":
        return nc == 0
    if nc != 0:  # null (or unknown-null) rows fail every comparison
        return False
    lo_s, hi_s = f.lower_bounds.get(name), f.upper_bounds.get(name)
    if lo_s is None or hi_s is None:
        return False
    lo, hi = decode_bound(lo_s), decode_bound(hi_s)
    try:
        if op == "in":
            vals = [_norm_value(v, dtype) for v in value]
            return lo == hi and lo in vals
        v = _norm_value(value, dtype)
        if op == "=":
            return lo == hi == v
        if op == "<":
            return hi < v
        if op == "<=":
            return hi <= v
        if op == ">":
            return lo > v
        if op == ">=":
            return lo >= v
    except TypeError:
        return False
    return False


def _survives_partition(f: DataFile, spec: PartitionSpec, col: str, op: str,
                        value: Any) -> bool:
    """Partition-value pruning for identity/days transforms (string-safe ops)."""
    for field in spec.fields:
        if field.source != col:
            continue
        pv = f.partition.get(field.name)
        if pv is None:
            continue
        tv = field.apply_python(value) if op != "in" else None
        eq_prunable = (
            field.transform in ("identity", "days")
            or field.transform.startswith("bucket[")
        )
        if op == "in":
            tvs = [field.apply_python(v) for v in value]
            if all(t is not None for t in tvs) and pv not in tvs:
                if eq_prunable:
                    return False
            continue
        if tv is None:
            continue
        if field.transform == "days":
            # yyyy-MM-dd strings order correctly
            if op == "=" and pv != tv:
                return False
            if op in ("<", "<=") and pv > tv:
                return False
            if op in (">", ">=") and pv < tv:
                return False
        elif eq_prunable and op == "=" and pv != tv:
            return False
    return True


def prune_manifest_records(
    records: list[dict],
    predicates: Sequence[Predicate] | None,
    spec: PartitionSpec | None,
) -> list[dict]:
    """Manifest-level skip via ``partition_summaries`` — drop whole manifests
    before reading a single entry. The layer above :func:`prune_files`: at
    10^12 turns the manifest layer itself is large, and after
    ``RewriteManifestsJob`` partition-sorts entries, each manifest's summary
    covers a narrow range, so a time-range predicate opens only the manifests
    it needs.

    Soundness: a summary's lo/hi are the lexical min/max of the partition
    values present, so lexical containment is safe for equality on ANY
    string-encoded transform (a present value is always inside its own
    min/max). Range ops are applied only for ``days`` (fixed-width yyyy-MM-dd
    orders lexically), mirroring `_survives_partition`.
    """
    if not predicates or spec is None or not spec.fields:
        return list(records)
    by_source: dict[str, list] = {}
    for field in spec.fields:
        by_source.setdefault(field.source, []).append(field)
    out = []
    for rec in records:
        sums = rec.get("partition_summaries") or {}
        keep = True
        for col, op, value in predicates:
            for field in by_source.get(col, ()):
                raw = sums.get(field.name)
                if not raw:
                    continue
                try:
                    bounds = json.loads(raw)
                except ValueError:
                    continue
                lo, hi = bounds.get("lo"), bounds.get("hi")
                if lo is None or hi is None:
                    continue
                if op in ("=", "in"):
                    vals = list(value) if op == "in" else [value]
                    tvs = [field.apply_python(v) for v in vals]
                    if (all(t is not None for t in tvs)
                            and not any(lo <= t <= hi for t in tvs)):
                        keep = False
                        break
                elif field.transform == "days" and op in ("<", "<=", ">", ">="):
                    tv = field.apply_python(value)
                    if tv is None:
                        continue
                    if op in ("<", "<=") and lo > tv:
                        keep = False
                        break
                    if op in (">", ">=") and hi < tv:
                        keep = False
                        break
            if not keep:
                break
        if keep:
            out.append(rec)
    return out


def prune_files(
    files: Iterable[DataFile],
    predicates: Sequence[Predicate] | None,
    schema: T.StructType | None = None,
    spec: PartitionSpec | None = None,
    aliases: dict[str, list[str]] | None = None,
) -> list[DataFile]:
    """``aliases`` maps a current column name to its historical names
    (RENAME COLUMN): stats are recorded under the write-era name, so the
    bounds lookup resolves per file (newest name first)."""
    if not predicates:
        return list(files)
    dtypes = {f.name: f.dataType for f in schema.fields} if schema else {}
    names = {
        col: [col] + list(reversed(olds))
        for col, olds in (aliases or {}).items()
    }
    out = []
    for f in files:
        keep = True
        for col, op, value in predicates:
            if not _survives_bounds(f, col, op, value, dtypes.get(col),
                                    names.get(col)):
                keep = False
                break
            if spec is not None and not _survives_partition(f, spec, col, op, value):
                keep = False
                break
        if keep:
            out.append(f)
    return out
