"""Watermarked event-time window aggregation — tumbling + sliding.

The reference's documented query surface aggregates the unified audit table
by time buckets ("activity in the last 7 days",
`/root/reference/_resources/PIPELINE_OVERVIEW.md:300-308`,
`utilities/post_setup_ocsf_tables.py:25-29`); its streaming counterpart on
the platform is a watermarked windowed aggregate. This module provides both
twins over the engine's transcript/event streams:

- :func:`windowed_agg_batch` — the batch shape: ``F.window(ts, ...)`` is a
  pure Catalyst projection (window assignment is arithmetic, sliding
  windows explode into at most ``window/slide`` rows), followed by ONE hash
  aggregation. No Python, no extra shuffle beyond the group-by.
- :func:`windowed_agg_stream` — the same plan over a streaming DataFrame
  with ``withWatermark``: in append output mode a (key, window) result row
  is emitted exactly once, when the watermark passes ``window.end``, and
  events arriving later than the watermark are dropped by the stateful
  operator — the late-data contract the north rule's streaming ingestion
  needs (state per key×window is O(aggregate), bounded by the watermark
  horizon).

At 10^12-turn scale the streaming aggregate's state is what matters: a
tumbling window holds ``keys × 1`` aggregation buffers and the watermark
retires them monotonically; a sliding window multiplies state by
``window/slide``. Both twins share the exact same aggregate expressions, so
the pytest parity check (finalized stream windows == batch windows) pins
the semantics, and the ``window_agg`` driver query pins the batch twin
against a DuckDB epoch-bucket oracle.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def _default_aggs() -> dict[str, Column]:
    return {"n_events": F.count(F.lit(1))}


def _windowed(df: DataFrame, key_col: str, ts_col: str, window_sec: int,
              slide_sec: int | None,
              aggs: Mapping[str, Column] | None) -> DataFrame:
    if window_sec <= 0:
        raise ValueError("window_sec must be positive")
    if slide_sec is not None and not 0 < slide_sec <= window_sec:
        raise ValueError("slide_sec must be in (0, window_sec]")
    win = F.window(
        ts_col, f"{window_sec} seconds",
        *([f"{slide_sec} seconds"] if slide_sec else []),
    )
    agg_map = dict(aggs) if aggs else _default_aggs()
    return (
        df.groupBy(F.col(key_col), win.alias("win"))
        .agg(*[c.alias(name) for name, c in agg_map.items()])
        .select(
            key_col,
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *agg_map.keys(),
        )
    )


def windowed_agg_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_sec: int = 3600,
    slide_sec: int | None = None,
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide_sec``) event-time windows per key.

    Output: ``key, win_start, win_end, <one column per agg>``. Tumbling
    windows are aligned to the epoch (``win_start = floor(epoch/window) *
    window``), which is what makes the DuckDB bucket oracle exact."""
    return _windowed(df, key_col, ts_col, window_sec, slide_sec, aggs)


def windowed_agg_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_sec: int = 3600,
    slide_sec: int | None = None,
    aggs: Mapping[str, Column] | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """The streaming twin: identical plan over ``withWatermark``.

    Append-mode semantics: a (key, window) row is final — emitted once the
    watermark (max event time seen, minus ``watermark_delay``) passes
    ``win_end``. The late-data contract is Spark's one-sided guarantee:
    events within ``watermark_delay`` are never dropped; an event later
    than that is dropped once its window has been finalized (it can never
    reopen or duplicate an emitted row), but a late row racing the very
    batch in which the watermark first jumps may still be merged — the
    input-side late filter evaluates against the previous batch's
    watermark, while eviction uses the current one."""
    return _windowed(
        stream_df.withWatermark(ts_col, watermark_delay),
        key_col, ts_col, window_sec, slide_sec, aggs,
    )
