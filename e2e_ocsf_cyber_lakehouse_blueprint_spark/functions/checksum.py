"""Distributed scan-equivalence checksum (SURVEY.md §2.4).

The conformance suites verify maintenance ops with driver-side ``collect()``
row comparison — fine at test scale, impossible for a 10^12-turn table. This
operator is the distributed form: ONE aggregation pass produces a per-
conversation digest of the turn payloads in stable (conv_id, turn_idx) order,
so two table states scan-equivalently iff their checksum tables are equal
(itself checkable with a distributed anti-join, or collapsed to a single
order-insensitive table fingerprint).

md5-based so a DuckDB oracle reproduces the exact digests (the engine-internal
fast path would be xxhash64; md5 is what makes the cross-engine gate provable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIELD_SEP = "\x1e"   # RS: joins fields inside one turn
_TURN_SEP = "\x1f"    # US: joins turns inside one conversation
_NULL = "<NULL>"


def _row_payload(payload_cols) -> F.Column:
    return F.concat_ws(
        _FIELD_SEP,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in payload_cols],
    )


def conv_checksum(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    payload_cols: tuple[str, ...] = ("turn_idx", "role", "text", "tool"),
) -> DataFrame:
    """(conv_id, n_turns, conv_md5): md5 over the conversation's turn payloads
    in ``order_col`` order — one shuffle on conv_id, no window, no sort stage
    (the per-group ordering happens in array_sort over the collected structs,
    keyed by the unique order column)."""
    item = F.struct(F.col(order_col), _row_payload(payload_cols).alias("s"))
    arr = F.array_sort(F.collect_list(item))
    return df.groupBy(F.col(conv_col)).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(F.concat_ws(_TURN_SEP, F.transform(arr, lambda x: x["s"]))).alias("conv_md5"),
    )


def table_fingerprint(df: DataFrame, **kwargs) -> DataFrame:
    """Single-row order-insensitive fingerprint of the whole table: the sum of
    the per-conversation digests' 60-bit prefixes plus conv/turn counts.
    Equal fingerprints (at these widths) == scan-equivalent tables; cheap
    enough to run after every maintenance commit at any scale."""
    per_conv = conv_checksum(df, **kwargs)
    # DECIMAL(38,0) accumulator: 10^12 convs x 2^60 prefix ~ 1.2e30 < 1e38
    # (a long would overflow at ~16 convs)
    digest = F.conv(F.substring("conv_md5", 1, 15), 16, 10).cast("decimal(20,0)")
    return per_conv.agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.sum("n_turns").alias("n_turns"),
        F.sum(digest).cast("decimal(38,0)").alias("digest_sum"),
    )
