"""As-of (temporal) join: each left row picks the nearest right row at or
before (backward) / at or after (forward) its timestamp, per key.

Spark has no ASOF JOIN operator. The naive formulations both fail at scale:
a range theta-join explodes into BroadcastNestedLoop/cartesian, and a
"max right ts <= left ts" subquery costs a join plus a re-join. This
implementation uses the union trick instead:

    union(left tagged _side=1, right tagged _side=0)
      -> window last(right_payload_struct, ignorenulls) over
         (partitionBy key, orderBy ts, _side rows unbounded preceding)
      -> filter _side=1

which costs exactly ONE hash shuffle of the combined rows (the window's
partitioning) — the same exchange count as an equi-join, with no range
explosion and AQE-friendly sizing. Skewed keys behave like any window skew
(one reducer per hot key); salt upstream if a single key exceeds a task.

Tie semantics: right rows sort BEFORE left rows at equal timestamps, so a
right row at exactly the left timestamp matches (inclusive, like DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``). If the right side has duplicate
(key, ts) rows the winner among them is unspecified — pre-aggregate the
right side to unique (key, ts) for deterministic output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_sec: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. Output = every left row + the matched right row's
    payload columns (named ``<col><suffix>`` on collision with a left
    column; the matched right timestamp always appears as
    ``<right_ts><suffix>``), nulls when no right row qualifies.

    ``tolerance_sec`` additionally requires ``|left_ts - right_ts| <=
    tolerance_sec`` (a match further away is nulled out, like pandas
    ``merge_asof(tolerance=...)``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    rpayload = [c for c in right.columns if c not in keys]
    if right_ts not in rpayload:
        raise ValueError(f"right_ts column {right_ts!r} missing from right side")
    rstruct_type = T.StructType([right.schema[c] for c in rpayload])

    lcols = left.columns
    l2 = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct_type).alias("_r"),
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rpayload]).alias("_r"),
    ).select(*lcols, "_t", "_side", "_r")

    ts_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)

    out = (
        l2.unionByName(r2)
        .withColumn("_m", matched)
        .filter(F.col("_side") == 1)
    )
    if tolerance_sec is not None:
        dist = F.abs(
            F.unix_timestamp(F.col("_t"))
            - F.unix_timestamp(F.col("_m")[right_ts])
        )
        out = out.withColumn(
            "_m", F.when(dist <= tolerance_sec, F.col("_m"))
        )

    taken = set(lcols)

    def out_name(c: str) -> str:
        return c + suffix if c in taken or c == right_ts else c

    return out.select(
        *lcols,
        *[F.col("_m")[c].alias(out_name(c)) for c in rpayload],
    )
