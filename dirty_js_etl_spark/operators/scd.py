"""Slowly-changing-dimension (type 2) history from a change stream.

Reference analog: the MERGE upsert (T5, ``tsql2008.js:252-317``) keeps
only the latest value per key; SCD2 is the standard warehouse extension
that keeps *every* version with a validity interval. Built here from the
``events`` change stream with one window over (key, ts).

Scale design: a single shuffle on the entity key (the window partition);
``lead`` closes each interval without a self-join, so history build cost
is O(n log n_per_key) locally per partition. At 100 TB the key
partitioning matches the natural downstream access path (point-in-time
lookups by key), and skewed keys are bounded by per-user event counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """One row per observed version: ``valid_from`` = the change's
    timestamp, ``valid_to`` = the next change's timestamp (NULL while
    current), ``version`` = 1-based sequence, ``is_current`` flag.
    ``tie_break`` orders simultaneous changes deterministically."""
    order = [F.col(ts_col)] + ([F.col(tie_break)] if tie_break else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in value_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
