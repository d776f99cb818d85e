"""Sessionization: inactivity-gap sessions over keyed event streams.

The reference's transcripts are already conversation-framed; a maintenance
engine for agent-transcript lakehouses also needs the inverse — deriving
conversation/session boundaries from raw keyed event streams (activity logs,
tool-call telemetry) before they land as transcript rows. Two interchangeable
implementations:

- ``sessionize_batch``: pure Catalyst gaps-and-islands (lag + running sum +
  groupBy). One shuffle on the key, whole-stage-codegen throughout, and the
  session index is deterministic, so the operator is safely re-runnable and
  DuckDB-oracle-checkable. This is the 100 TB path: no Python in the loop.
- ``sessionize_stream``: true Structured Streaming via
  ``applyInPandasWithState`` (event-time timeout). Sessions closed by an
  in-batch gap are emitted immediately; the trailing open session is held in
  state and flushed when the event-time watermark passes its end + gap.
  State per key is O(1) (one open session), so state-store size is bounded
  by live keys, not events.

Batch and stream agree on CLOSED sessions: a session is closed once an event
at or past ``end + gap`` exists (stream: watermark crossing; batch: next
session's first row or end-of-input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SEC = 1800


def sessionize_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = DEFAULT_GAP_SEC,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key inactivity-gap sessions as (key, session_idx, n_events,
    start_ts, end_ts, duration_sec). A new session starts when the gap from
    the previous event is STRICTLY greater than ``gap_sec``.

    Ties on ``ts`` do not move session BOUNDARIES (lag over equal timestamps
    yields a zero gap regardless of intra-tie order), but a unique
    ``tiebreak_col`` makes the lag/running-sum window itself fully
    deterministic, which matters for plan-stable re-runs at scale — pass
    one whenever the input has a unique event id.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_sec)
    ).cast("long")
    run = Window.partitionBy(key_col).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        df.select(key_col, ts_col, *([tiebreak_col] if tiebreak_col else []))
        .withColumn("_new", new_sess)
        .withColumn("session_idx", F.sum("_new").over(run))
        .groupBy(key_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .withColumn(
            "duration_sec",
            F.unix_timestamp("end_ts") - F.unix_timestamp("start_ts"),
        )
    )
    return sessions


def closed_sessions_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = DEFAULT_GAP_SEC,
    watermark_ts=None,
) -> DataFrame:
    """The subset of batch sessions a stream with watermark ``watermark_ts``
    would already have emitted: ``end_ts + gap <= watermark``."""
    s = sessionize_batch(df, key_col, ts_col, gap_sec)
    if watermark_ts is None:
        return s
    return s.filter(
        (F.unix_timestamp("end_ts") + F.lit(gap_sec))
        <= F.unix_timestamp(F.lit(watermark_ts).cast("timestamp"))
    )


def sessionize_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = DEFAULT_GAP_SEC,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``.

    State per key: the one open session (start_ms, end_ms, n). Each batch
    sorts its rows, closes every session whose successor gap exceeds
    ``gap_sec`` (emitted immediately), and re-arms an event-time timeout at
    ``end + gap`` for the still-open tail; the timeout firing emits the
    held session. Output rows therefore appear exactly once per closed
    session (append-mode sink safe).
    """
    import pandas as pd  # noqa: F401 (arrow batch path)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_sec * 1000

    out_schema = (
        f"{key_col} long, session_idx long, n_events long, "
        "start_ts timestamp, end_ts timestamp, duration_sec long"
    )
    state_schema = "start_ms long, end_ms long, n long, emitted long"

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (k,) = key

        def to_row(start_ms, end_ms, n, idx):
            return {
                key_col: k,
                "session_idx": idx,
                "n_events": n,
                "start_ts": pd.Timestamp(start_ms, unit="ms"),
                "end_ts": pd.Timestamp(end_ms, unit="ms"),
                "duration_sec": (end_ms - start_ms) // 1000,
            }

        if state.hasTimedOut:
            start_ms, end_ms, n, emitted = state.get
            state.remove()
            yield pd.DataFrame([to_row(start_ms, end_ms, n, emitted + 1)])
            return

        ts_ms = []
        for pdf in pdf_iter:
            ts_ms.extend(
                (pdf[ts_col].astype("int64") // 1_000_000).tolist()
            )
        ts_ms.sort()
        if state.exists:
            start_ms, end_ms, n, emitted = state.get
        else:
            start_ms = end_ms = ts_ms[0]
            n, emitted = 0, 0  # n=0: the first event is counted below
        closed = []
        for t in ts_ms:
            if n > 0 and t - end_ms > gap_ms:
                closed.append(to_row(start_ms, end_ms, n, emitted + 1))
                emitted += 1
                start_ms = t
                n = 0
            end_ms = max(end_ms, t)
            n += 1
        state.update((start_ms, end_ms, n, emitted))
        state.setTimeoutTimestamp(end_ms + gap_ms)
        if closed:
            yield pd.DataFrame(closed)

    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
