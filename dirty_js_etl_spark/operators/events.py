"""Event-stream batch operators: JSON property extraction, sessionization,
time-bucketed rollups (the batch halves of the streaming module; the
``events`` fixture table is the driver's stream stand-in).

The reference has no array/map/json surface (SURVEY.md §2.3); the
``events.props`` JSON string column is the designated extension seam.

Scale notes: sessionization is one shuffle (partition by user, sort by
ts) using ``lag`` + running sum — the standard gap-sessionize; rollups
aggregate on (bucket, type) with map-side partials. Money-style sums go
through DECIMAL so results are order-independent (exact) and only then
cast back to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_props(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """Extract JSON properties: ``fields`` maps output column -> JSON path
    suffix (e.g. {'k_val': 'k'}); values cast to int when they look
    integral is left to the caller — extraction returns strings."""
    out = df
    for col, path in fields.items():
        out = out.withColumn(col, F.get_json_object(F.col("props"), f"$.{path}"))
    return out


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds the gap. Adds ``session_seq`` (per
    user, 1-based) and ``session_id`` (user_id * 1M + seq, stable)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), "event_id")
    gap = F.lit(gap_minutes * 60)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap)
    ).cast("int")
    return df.withColumn("__new", new_session).withColumn(
        "session_seq",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn(
        "session_id", F.col(user_col) * 1_000_000 + F.col("session_seq")
    ).drop("__new")


def session_stats(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup: bounds, event count, exact value sum."""
    s = sessionize(df, gap_minutes=gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )


def hourly_rollup(df: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup by event type — the batch equivalent of the
    streaming windowed aggregation (streaming/events.py drives the same
    logic through writeStream)."""
    return (
        df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
