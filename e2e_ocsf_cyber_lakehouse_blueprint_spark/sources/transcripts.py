"""Deterministic synthetic transcripts table (conv_id, turn_idx, role, text, tool, ts).

The engine's primary fixture per FIXTURES.md section 1 / BASELINE.json input_hint.
Generation is 100%% Spark-native (`spark.range` + Catalyst expressions — the
same discipline as the reference's expression-only transforms, e.g.
`silver_github_audit_logs.py:29-70`): no driver-side loops, no Python UDFs, so
the generator itself scales with executors and is wall-clock-free (stable
across runs for a given seed).

Skew: conversation sizes are Zipf-like — a configurable head of "hot"
conversations carries 10^2-10^4 turns each while the tail has a few turns —
exercising the salted-join / AQE-skew paths (BASELINE.json north_star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA_DDL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["search", "bash", "read", "write", "browse"]
_BASE_EPOCH = 1735689600  # 2025-01-01T00:00:00Z — fixed, wall-clock-free


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    *,
    seed: int = 42,
    hot_convs: int = 3,
    hot_turns: int = 2000,
    base_turns: int = 4,
    turns_jitter: int = 12,
    span_days: int = 45,
) -> DataFrame:
    """Deterministic transcripts DataFrame.

    Row count ≈ n_convs * (base_turns + turns_jitter/2) + hot_convs * hot_turns.
    """
    convs = (
        spark.range(n_convs)
        .withColumn("conv_id", F.format_string("conv-%010d", F.col("id")))
        .withColumn(
            "n_turns",
            F.when(
                F.col("id") < hot_convs, F.lit(hot_turns)
            ).otherwise(
                base_turns
                + F.pmod(F.xxhash64(F.col("conv_id"), F.lit(seed)), F.lit(turns_jitter))
            ).cast("int"),
        )
    )
    turns = convs.select(
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.xxhash64("conv_id", "turn_idx", F.lit(seed))
    text_unit = F.md5(F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"),
                                  F.lit(str(seed))))
    text_len = (F.lit(20) + F.pmod(h, F.lit(1981))).cast("int")
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(F.array(*[F.lit(r) for r in _ROLES]),
                     (F.pmod(F.col("turn_idx"), F.lit(4)) + 1).cast("int")).alias("role"),
        F.substring(
            F.repeat(text_unit, (text_len / 32 + 2).cast("int")), 1, text_len
        ).alias("text"),
        F.when(
            F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(seed + 1)), F.lit(10)) < 3,
            F.element_at(
                F.array(*[F.lit(t) for t in _TOOLS]),
                (F.pmod(F.xxhash64("conv_id", F.lit(seed + 2)), F.lit(5)) + 1).cast("int"),
            ),
        ).alias("tool"),
        F.timestamp_seconds(
            F.lit(_BASE_EPOCH)
            + F.pmod(F.xxhash64("conv_id", F.lit(seed + 3)), F.lit(span_days * 86400))
            + F.col("turn_idx") * (F.lit(60) + F.pmod(h, F.lit(300)))
        ).alias("ts"),
    )


# --- derivation from the driver's `events` table ---------------------------
# Used by the oracle-checked maintenance queries in __spark_entry__: the same
# deterministic mapping is expressible in both Spark and DuckDB SQL, so a
# post-maintenance scan can be value-checked against plain SQL on the source
# parquet (scan-equivalence through the driver's own correctness gate).

TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  'conv-' || CAST(user_id % 211 AS STRING)                           AS conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id % 211
                          ORDER BY ts, event_id) - 1 AS INT)          AS turn_idx,
  CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       WHEN 2 THEN 'system' ELSE 'tool' END                          AS role,
  event_type || ':' || COALESCE(props, '')                           AS text,
  CASE WHEN event_id % 10 < 3 THEN 'search' ELSE NULL END            AS tool,
  ts                                                                  AS ts
FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)
