"""Cost-based planning from persisted ANALYZE stats (operators/analyze.py).

Manifest bounds answer "which files can match" — but when a predicate's value
range overlaps every file (a point lookup on a column the layout does not
sort by, a low-selectivity role filter), file pruning keeps the whole table
and the naive size estimate stays huge. Delta/Spark CBO solves this with
table-level column statistics; this module is that layer for our format:

- :func:`estimated_scan_rows` / :func:`estimated_scan_bytes` — classic
  Selinger selectivity over the persisted NDV / null-count / min-max stats,
  scaled onto the CURRENT snapshot's manifest row/byte counts (so stats from
  an older snapshot degrade gracefully instead of lying about table size).
- :func:`scan_for_join` — ``table.scan(predicates)`` plus a ``broadcast``
  hint iff the estimate lands under the session's
  ``spark.sql.autoBroadcastJoinThreshold``. Catalyst cannot see through our
  Python-side planner (the relation it sees is a plain parquet scan of the
  pruned file list, sized at ALL its bytes), so the hint is how persisted
  stats reach join planning.
- :func:`suggest_shuffle_partitions` — size a job's shuffle width from the
  estimated post-filter bytes instead of a global constant.

Estimates are ADVISORY: every consumer falls back to Spark's defaults when
no ANALYZE payload exists, and correctness never depends on them (a wrongly
broadcast relation still joins correctly — Spark spills or fails loudly at
the driver maxResultSize boundary, which is why the threshold is also capped
by ``costs.broadcast-cap-bytes``).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame

from ..operators.analyze import read_stats
from .pruning import Predicate

# guardrail for auto-broadcast even when the session threshold is huge
DEFAULT_BROADCAST_CAP = 256 * 1024 * 1024
_DEFAULT_RANGE_SELECTIVITY = 0.3  # Selinger's classic default
_SIZE_RE = re.compile(r"^(-?\d+)\s*([kmgt]?b?)$", re.IGNORECASE)
_UNIT = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
         "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40,
         "tb": 1 << 40}


def parse_size(s: str | int | None, default: int = -1) -> int:
    """Spark size-conf parser ('10MB', '10485760b', 10485760) -> bytes."""
    if s is None:
        return default
    if isinstance(s, int):
        return s
    m = _SIZE_RE.match(str(s).strip())
    if not m:
        return default
    return int(m.group(1)) * _UNIT[m.group(2).lower()]


def _selectivity(pred: Predicate, st: dict, analyzed_rows: int) -> float:
    """Fraction of rows surviving one conjunct, from that column's stats."""
    _col, op, value = pred
    rows = max(1, analyzed_rows)
    ndv = max(1, int(st.get("ndv") or 1))
    null_frac = min(1.0, (st.get("null_count") or 0) / rows)
    if op == "=":
        return (1.0 - null_frac) / ndv
    if op == "in":
        vals = value if isinstance(value, (list, tuple, set)) else [value]
        return min(1.0, (1.0 - null_frac) * len(vals) / ndv)
    if op == "isnull":
        return null_frac
    if op == "notnull":
        return 1.0 - null_frac
    if op in ("<", "<=", ">", ">="):
        lo, hi = st.get("min"), st.get("max")
        frac = _range_fraction(op, value, lo, hi)
        return (1.0 - null_frac) * (
            frac if frac is not None else _DEFAULT_RANGE_SELECTIVITY)
    return 1.0  # unknown op: no reduction claimed


def _range_fraction(op: str, value, lo, hi) -> float | None:
    """Interpolated fraction for numeric range predicates; None when the
    column is not numeric or the bounds are degenerate."""
    try:
        v, l, h = float(value), float(lo), float(hi)
    except (TypeError, ValueError):
        return None
    if h <= l:
        return None
    frac_below = min(1.0, max(0.0, (v - l) / (h - l)))
    return frac_below if op in ("<", "<=") else 1.0 - frac_below


def estimated_scan_rows(
    table, predicates: Sequence[Predicate] | None = None
) -> int | None:
    """Estimated output rows of ``table.scan(predicates)``: live manifest
    row count after file pruning, times the product of per-conjunct
    selectivities from the persisted ANALYZE stats. None without stats."""
    payload = read_stats(table)
    if payload is None:
        return None
    files = table.plan_scan(predicates)
    rows = sum(f.record_count for f in files)
    sel = 1.0
    for pred in predicates or []:
        st = payload["columns"].get(pred[0])
        if st is None:
            continue  # un-analyzed column: claim nothing
        sel *= _selectivity(pred, st, payload["rows"])
    return int(rows * sel)


def estimated_scan_bytes(
    table, predicates: Sequence[Predicate] | None = None,
    columns: Sequence[str] | None = None,
) -> int | None:
    """Byte estimate for the scan: estimated rows x average live row width
    (manifest bytes / manifest rows — compressed-on-disk width, which is the
    conservative side for a broadcast decision on parquet). ``columns``
    scales the width by the projected columns' share of average string
    length when the stats carry ``avg_len``."""
    rows_est = estimated_scan_rows(table, predicates)
    if rows_est is None:
        return None
    files = table.live_data_files()
    tot_rows = sum(f.record_count for f in files)
    tot_bytes = sum(f.file_size_bytes for f in files)
    if not tot_rows:
        return 0
    width = tot_bytes / tot_rows
    if columns is not None:
        payload = read_stats(table)
        lens = {c: (st.get("avg_len") or 8)
                for c, st in payload["columns"].items()}
        if lens:
            all_w = sum(lens.get(f.name, 8) for f in table.schema.fields)
            proj_w = sum(lens.get(c, 8) for c in columns)
            width *= max(0.05, proj_w / max(1.0, all_w))
    return int(rows_est * width)


def scan_for_join(
    table, predicates: Sequence[Predicate] | None = None,
    columns: Sequence[str] | None = None,
    *, broadcast_cap: int = DEFAULT_BROADCAST_CAP,
) -> DataFrame:
    """``table.scan(...)`` with a ``broadcast`` hint when the ANALYZE-backed
    estimate fits under the session's autoBroadcastJoinThreshold (and the
    cap). Without persisted stats the plain scan returns — never a guess."""
    df = table.scan(predicates, columns=columns)
    est = estimated_scan_bytes(table, predicates, columns)
    if est is None:
        return df
    thr = parse_size(
        table.spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    if 0 <= est <= min(thr if thr > 0 else 0, broadcast_cap):
        return df.hint("broadcast")
    return df


def suggest_shuffle_partitions(
    table, predicates: Sequence[Predicate] | None = None,
    *, target_partition_bytes: int = 64 * 1024 * 1024,
    floor: int | None = None, cap: int = 10_000,
) -> int | None:
    """Shuffle width sized from the estimated post-filter bytes: one
    partition per ~``target_partition_bytes``, floored at the session
    default parallelism (idle cores help even tiny shuffles). None without
    stats — callers keep their static setting."""
    est = estimated_scan_bytes(table, predicates)
    if est is None:
        return None
    if floor is None:
        floor = table.spark.sparkContext.defaultParallelism
    return max(floor, min(cap, -(-est // target_partition_bytes)))


def suggest_salt_buckets(
    table, key_col: str, *, skew_factor: float = 4.0, cap: int = 64,
) -> int | None:
    """Salt-bucket count for a join keyed on ``key_col``, derived from the
    persisted ANALYZE ``top_count`` frequency stat (the rows held by the
    single hottest key — ``analyze_table(frequency_columns=[key_col])``).

    A key is pathological when its row count dwarfs the average shuffle
    partition: AQE's skew split can divide an oversized PARTITION, but all
    rows of one key still land in one task's join hash bucket, so only
    salting fans the hot key itself out. Returns None (no salting) when no
    stats / no frequency stat exist or the hot key fits within
    ``skew_factor`` average partitions; otherwise ceil(top / avg-partition)
    clamped to [2, cap] — enough buckets that each salted slice of the hot
    key is about one average partition's worth of rows."""
    payload = read_stats(table)
    if payload is None:
        return None
    st = payload["columns"].get(key_col) or {}
    top = st.get("top_count")
    if not top:
        return None
    rows = max(1, payload["rows"])
    parts = int(table.spark.conf.get("spark.sql.shuffle.partitions", "200"))
    avg_per_part = max(1.0, rows / max(1, parts))
    if top <= skew_factor * avg_per_part:
        return None
    return min(cap, max(2, -(-int(top) // int(avg_per_part))))
