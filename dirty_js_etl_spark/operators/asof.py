"""As-of (backward) join — a custom operator Spark's built-ins lack.

For each left row, attach the payload of the *latest* right row with
``right_time <= left_time`` within the same key group (the semantics of
DuckDB/kdb ``ASOF JOIN``, pandas ``merge_asof``). The naive
range-condition join explodes to O(|L|·|R|) per key and Spark plans it
as a broadcast-nested-loop; this implementation uses the canonical
scalable decomposition instead:

1. union the two sides into one stream of (key, time, side, payload);
2. one hash shuffle by key, sort by (time, right-side-first on ties —
   a snapshot taken at t applies to an event at the same t);
3. running ``last(payload, ignoreNulls)`` window fills each left row
   with the most recent right payload;
4. keep only the left rows.

Cost: ONE shuffle of |L|+|R| narrow rows and a per-key sort — the same
profile as a sort-merge join, independent of time-range density. Skew
follows the key distribution (a whale key concentrates its sort); AQE
skew-split does not apply to windows, so extremely hot keys would need
a coarse time-bucket pre-split — not needed at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 1 = right (snapshot), 0 = left (probe)
_TIME = "__asof_t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows gain the payload of the nearest right row at
    or before (``direction="backward"``, the default) or at or after
    (``direction="forward"``) their timestamp; NULL when none exists.
    Forward is the same union + window plan run in reverse time order —
    identical cost profile, no extra machinery.

    ``payload_cols`` defaults to every right column except the key and
    time columns. Left columns all pass through unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, right_time)]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns clash with left columns: {sorted(clash)}")

    l_side = left.select(
        F.col(on),
        F.col(left_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload_cols],
    )
    r_side = right.select(
        F.col(on),
        F.col(right_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c != on
        ],
        *[F.col(c) for c in payload_cols],
    )

    t_order = F.col(_TIME).asc() if direction == "backward" else F.col(_TIME).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(t_order, F.col(_SIDE).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__filled_{c}")
            for c in payload_cols
        ],
    )
    return filled.filter(F.col(_SIDE) == 0).select(
        F.col(on),
        *[F.col(c) for c in left.columns if c != on],
        *[F.col(f"__filled_{c}").alias(c) for c in payload_cols],
    )
