"""Custom stateful streaming operator: gap sessionization via
``applyInPandasWithState`` (Arrow-batched, per-key state).

The reference has no streaming at all (SURVEY.md §2.3); this is the
north-star extension surface for operators Spark's built-in streaming
aggregations can't express — session windows keyed by activity gaps,
where state must carry the *open* session across micro-batches.

Semantics match the batch ``operators/events.session_stats`` exactly
(same gap rule, same ``session_id = user_id*1e6 + seq`` scheme): when
the finite fixture stream drains, the emitted sessions equal the batch
answer — which is the oracle check.

Scale design:

- state is one tiny fixed-width row per ACTIVE user (open session
  only) — closed sessions are emitted and dropped from state, so state
  size is bounded by concurrent users, not history;
- grouping shuffles by ``user_id`` once; within a group the kernel is a
  vectorized pandas pass in ts order;
- money-exact totals: values are accumulated in integer micro-units
  (Decimal-quantized), matching the DECIMAL(18,6) sum the batch oracle
  uses — no float drift between engines;
- update output mode re-emits a session each time it grows;
  :func:`latest_sessions` collapses to the final emission per session
  (idempotent — safe on the single-batch case too). Assumes per-user
  in-order arrival (split batches by event time); late data beyond that
  needs a watermark + append-mode variant.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_EVEN, Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# open-session state: all scalars (timestamps as epoch micros, total in
# integer micro-units so accumulation is exact)
STATE_SCHEMA = "start_us long, last_us long, seq long, n long, total_u long"

_US_PER_MINUTE = 60_000_000


def _micro_units(val: float) -> int:
    """value -> integer 1e-6 units, exactly as DECIMAL(18,6) casts it."""
    return int(
        (Decimal(float(val)) * 1_000_000).to_integral_value(
            rounding=ROUND_HALF_EVEN
        )
    )


def _session_fn(gap_us: int):
    import pandas as pd

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        user_id = int(key[0])
        if state.exists:
            start_us, last_us, seq, n, total_u = state.get
        else:
            start_us = last_us = None
            seq = n = total_u = 0

        out: list[tuple] = []

        def emit() -> None:
            out.append(
                (
                    user_id,
                    user_id * 1_000_000 + seq,
                    start_us,
                    last_us,
                    n,
                    total_u / 1_000_000.0,
                )
            )

        def finish(rows_out: list[tuple]) -> "pd.DataFrame":
            pdf = pd.DataFrame(
                rows_out,
                columns=[
                    "user_id",
                    "session_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "total_value",
                ],
            )
            pdf["session_start"] = pd.to_datetime(pdf["session_start"], unit="us")
            pdf["session_end"] = pd.to_datetime(pdf["session_end"], unit="us")
            return pdf

        # event-time timeout: the watermark passed this user's open
        # session + gap, so the session can never grow — emit its final
        # form and REMOVE the state entry. This is what bounds state to
        # users active within the watermark horizon instead of every
        # user ever seen (NoTimeout's unbounded-keys leak).
        if state.hasTimedOut:
            if last_us is not None:
                emit()
            state.remove()
            yield finish(out)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            rows = rows.sort_values(["ts", "event_id"])
            ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
            for t, val in zip(ts_us, rows["value"]):
                t = int(t)
                vu = 0 if pd.isna(val) else _micro_units(val)
                if last_us is None:
                    seq, start_us, n, total_u = seq + 1, t, 1, vu
                elif t - last_us > gap_us:
                    emit()  # close the previous session
                    seq, start_us, n, total_u = seq + 1, t, 1, vu
                else:
                    n += 1
                    total_u += vu
                last_us = t

        if last_us is not None:
            emit()  # current open session (re-emitted if it grows later)
            state.update((start_us, last_us, seq, n, total_u))
            # schedule the close: when the watermark passes last event +
            # gap the session is final (clamped above the current
            # watermark, as setTimeoutTimestamp requires)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last_us // 1000 + gap_us // 1000, wm_ms + 1)
            )

        yield finish(out)

    return fn


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Per-user gap sessionization over a streaming DataFrame with
    ``event_id``, ``ts`` (timestamp), ``user_id``, ``value`` columns.

    Event-time timeouts + state removal bound the state store to users
    whose open session is still reachable by the watermark; idle users'
    sessions close (final emission) and their state entry is deleted."""
    return events.withWatermark("ts", watermark).groupBy(
        "user_id"
    ).applyInPandasWithState(
        _session_fn(gap_minutes * _US_PER_MINUTE),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def latest_sessions(df: DataFrame) -> DataFrame:
    """Collapse update-mode re-emissions to the final state per session
    (a session only ever grows, so max n_events is the last word)."""
    w = Window.partitionBy("session_id").orderBy(
        F.col("n_events").desc(), F.col("session_end").desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def run_sessionize_stream(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    query_name: str = "sessions_stream",
) -> DataFrame:
    """Drain the fixture events stream through the stateful operator
    (memory sink + processAllAvailable) and return the final sessions."""
    from dirty_js_etl_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    q = (
        sessionize_stream(stream, gap_minutes=gap_minutes)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return latest_sessions(spark.table(query_name))
