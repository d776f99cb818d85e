"""ANALYZE TABLE: table/column statistics in ONE distributed aggregation.

Delta's ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` / Iceberg's
Puffin NDV-sketch blobs, re-expressed Spark-first: a single ``agg`` pass over
the delete-applied scan computes, per column — non-null count, null count,
NDV (``approx_count_distinct`` HLL by default: one pass, mergeable, bounded
memory at any scale; exact mode for small tables / oracle checks), min/max
for orderable types, and average length for strings. The result is stamped
with the snapshot id and stored in the table metadata (a metadata-only
commit), where external planners — or a human running ``DESCRIBE STATS`` —
can read it without touching data.

Scale notes: the whole job is one map-side-combinable aggregation (HLL
sketches and min/max merge associatively), so cost is one scan regardless of
column count; there is no per-column job. Exact NDV (``exact=True``) adds
``count(distinct)`` expand semantics — use it only when the column count x
cardinality fits comfortably in a shuffle.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

import dataclasses as _dc

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..format import snapshot as snap
from ..format.table import Table

PROP_KEY = "stats.analyze"

_ORDERABLE = (T.StringType, T.IntegerType, T.LongType, T.ShortType,
              T.ByteType, T.FloatType, T.DoubleType, T.DateType,
              T.TimestampType, T.TimestampNTZType, T.DecimalType)


@dataclass
class AnalyzeResult:
    snapshot_id: int
    rows: int
    columns: dict[str, dict]
    elapsed_sec: float = 0.0


def analyze_table(table: Table, columns: list[str] | None = None,
                  *, exact: bool = False, rsd: float = 0.05,
                  persist: bool = True,
                  frequency_columns: list[str] | None = None) -> AnalyzeResult:
    """Compute and (by default) persist column statistics for the CURRENT
    snapshot. Returns the stats; ``DESCRIBE STATS`` reads the persisted copy.

    ``frequency_columns`` additionally records ``top_count`` (rows held by
    the single most frequent value) for the named columns — the skew signal
    ``plans.costs.suggest_salt_buckets`` derives MERGE salting from. Each
    costs one groupBy shuffle on that column (the same exchange a merge on
    it would pay), so it is opt-in and meant for the table's join keys."""
    t0 = time.time()
    table.refresh()
    cur = table.current_snapshot()
    schema = table.schema
    names = [f.name for f in schema.fields
             if columns is None or f.name in columns]
    if columns is not None:
        unknown = set(columns) - {f.name for f in schema.fields}
        if unknown:
            raise ValueError(f"unknown columns: {sorted(unknown)}")
    by_name = {f.name: f.dataType for f in schema.fields}

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(names):
        dt = by_name[c]
        aggs.append(F.count(c).alias(f"_nn_{i}"))
        if exact:
            aggs.append(F.countDistinct(c).alias(f"_ndv_{i}"))
        else:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"_ndv_{i}"))
        if isinstance(dt, _ORDERABLE):
            aggs.append(F.min(c).alias(f"_min_{i}"))
            aggs.append(F.max(c).alias(f"_max_{i}"))
        if isinstance(dt, T.StringType):
            aggs.append(F.avg(F.length(c)).alias(f"_len_{i}"))

    row = table.scan().agg(*aggs).collect()[0]
    rows = row["_rows"]
    cols: dict[str, dict] = {}
    for i, c in enumerate(names):
        dt = by_name[c]
        st = {
            "null_count": rows - row[f"_nn_{i}"],
            "ndv": int(row[f"_ndv_{i}"]),
            "ndv_exact": bool(exact),
        }
        if isinstance(dt, _ORDERABLE):
            st["min"] = _enc(row[f"_min_{i}"])
            st["max"] = _enc(row[f"_max_{i}"])
        if isinstance(dt, T.StringType):
            st["avg_len"] = (round(float(row[f"_len_{i}"]), 2)
                             if row[f"_len_{i}"] is not None else None)
        cols[c] = st

    # frequency stats survive later ANALYZE calls that do not recompute
    # them (successive narrow ANALYZEs would otherwise drop the skew signal
    # the merge planner reads); they are heuristic inputs, so a slightly
    # stale top_count is acceptable and 'stale' flags the payload anyway
    prior = read_stats(table) or {"columns": {}}
    for c, st in prior["columns"].items():
        if "top_count" in st and c not in (frequency_columns or []):
            cols.setdefault(c, {})["top_count"] = st["top_count"]
    for c in frequency_columns or []:
        if c not in by_name:
            raise ValueError(f"unknown frequency column: {c}")
        # NULL keys never survive the MERGE inner join this signal tunes, so
        # a NULL-heavy column must not report NULL's row count as its hottest
        # key (it would salt a join whose join drops those rows anyway)
        top = (table.scan(columns=[c]).filter(F.col(c).isNotNull())
               .groupBy(c).count()
               .agg(F.max("count").alias("_m")).collect()[0]["_m"])
        cols.setdefault(c, {})["top_count"] = int(top or 0)

    res = AnalyzeResult(
        snapshot_id=cur.snapshot_id if cur else 0,
        rows=rows, columns=cols, elapsed_sec=time.time() - t0,
    )
    if persist:
        payload = json.dumps({
            "snapshot_id": res.snapshot_id,
            "computed_at_ms": snap.now_ms(),
            "rows": rows,
            "columns": cols,
        }, separators=(",", ":"), sort_keys=True)

        def mutate(meta):
            props = dict(meta.properties)
            props[PROP_KEY] = payload
            return _dc.replace(meta, properties=props,
                               version=meta.version + 1)

        table._commit_meta(mutate, "analyze-stats")
    return res


def _enc(v):
    if v is None:
        return None
    if isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


def read_stats(table: Table) -> dict | None:
    """The persisted ANALYZE payload, or None. Callers should compare
    ``snapshot_id`` with the current snapshot to judge staleness."""
    raw = table.meta.properties.get(PROP_KEY)
    return json.loads(raw) if raw else None


def describe_stats(table: Table) -> list[dict]:
    """``DESCRIBE STATS`` rows: one per analyzed column (plus staleness)."""
    table.refresh()
    payload = read_stats(table)
    if payload is None:
        return []
    cur = table.current_snapshot()
    stale = cur is not None and cur.snapshot_id != payload["snapshot_id"]
    out = []
    for c, st in sorted(payload["columns"].items()):
        out.append({
            "column": c,
            "rows": payload["rows"],
            "null_count": st.get("null_count"),
            "ndv": st.get("ndv"),
            "ndv_exact": st.get("ndv_exact"),
            "min": st.get("min"),
            "max": st.get("max"),
            "avg_len": st.get("avg_len"),
            "top_count": st.get("top_count"),
            "analyzed_snapshot_id": payload["snapshot_id"],
            "stale": stale,
        })
    return out
