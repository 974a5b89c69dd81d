"""Time-series resampling: regular-grid gap fill with forward fill.

No reference analog (SURVEY.md §2.3 — no window functions, no
time-series ops); this is the standard "resample events onto an hourly
grid and carry the last observation forward" operator that Spark has no
built-in for, composed from sequence+explode and an IGNORE NULLS window.

Scale: every stage is keyed by the series key — the per-hour
last-value agg, the bounds agg, the grid join, and the forward-fill
window all partition on ``key_col``, so one logical co-partitioning
serves the whole pipeline (AQE reuses the exchange where shapes allow)
and series are processed independently across executors. Grid explosion
is bounded by (span hours × keys), not events; the window is per-key,
never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_grid_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_break: str = "event_id",
) -> DataFrame:
    """One row per (key, hour) between each key's first and last event
    hour, carrying the hour's last observed value forward through empty
    hours. Deterministic: "last" is by (ts, tie_break) desc.

    Returns ``(key, hour, filled_value)``.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    # "last value in the hour" as max_by over the (ts, tie_break) order
    # key: a hash aggregation with MAP-SIDE partial combine, so each
    # input partition ships one row per (key, hour) into the shuffle.
    # The round-1–5 row_number window computed the same thing but had
    # to shuffle and SORT every raw event per (key, hour) partition —
    # strictly more data movement for a single-row-per-group answer.
    hourly = (
        events.select(
            F.col(key_col), hour.alias("hour"), F.col(value_col),
            F.struct(F.col(ts_col), F.col(tie_break)).alias("__ord"),
        )
        .groupBy(key_col, "hour")
        .agg(F.max_by(value_col, F.col("__ord")).alias("hour_value"))
    )
    # Gap fill WITHOUT the grid join (rounds 1–5: explode a per-key
    # bounds sequence, left-join the hourly values back, then window
    # over every grid row). Instead each OBSERVED hour emits the hours
    # up to (exclusive) the next observed hour, carrying the running
    # ignore-nulls fill computed before the explode — so both window
    # functions share one (key)-partitioned sort over the small hourly
    # relation, the explode is map-side, and the join + bounds
    # aggregation disappear. Grid coverage is identical (first..last
    # observed hour per key) and a NULL hour_value still inherits the
    # previous non-null fill, matching the oracle's IGNORE NULLS carry.
    w = Window.partitionBy(key_col).orderBy("hour")
    w_fill = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        hourly.select(
            key_col,
            "hour",
            F.last("hour_value", ignorenulls=True).over(w_fill).alias(
                "filled_value"
            ),
            F.lead("hour").over(w).alias("__next"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence(
                    "hour",
                    F.coalesce(
                        F.col("__next") - F.expr("INTERVAL 1 HOUR"),
                        F.col("hour"),
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour"),
            "filled_value",
        )
    )
