"""Skew handling: salted hash join + AQE configuration.

The reference has no joins at all ("No JOINs needed - it's one unified table!",
`_resources/PIPELINE_OVERVIEW.md:311`), but the engine's MERGE path joins on
conversation keys, and FIXTURES.md mandates Zipf-skewed conv sizes. Two layers
(BASELINE.json north_star pairs them explicitly):

1. AQE skew-join splitting — enabled session-wide (session.py); Spark splits
   oversized shuffle partitions at runtime. Covers moderate skew for free.
2. Explicit salting (this module) — for pathological hot keys beyond AQE's
   split threshold, e.g. a conv-id-level join where one conversation holds 10^7
   turns: the big side gets a random-but-deterministic salt in [0, N), the
   small side is exploded N ways, and the join key becomes (key, salt), fanning
   one hot hash bucket out to N.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Join big ⋈ small on ``on`` with the big side salted N ways.

    The salt on the big side is derived deterministically from all of the row's
    join columns plus a per-row uniform component (rand(seed)) so hot keys
    spread evenly; the small side is exploded across all salts (size × N — keep
    the small side genuinely small or broadcastable).
    """
    big_s = big.withColumn(
        SALT_COL, F.floor(F.rand(seed) * salt_buckets).cast("int")
    )
    small_s = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    joined = big_s.join(small_s, list(on) + [SALT_COL], how)
    return joined.drop(SALT_COL)


def key_frequency_skew(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` — a cheap skew census used to
    decide between the plain-AQE and salted paths (metadata-sized result)."""
    return df.groupBy(key).count().filter(F.col("count") > threshold)
