"""Range (interval) join — point-in-interval matching without the
nested-loop explosion.

Spark plans a raw ``l.t BETWEEN r.start AND r.end`` join condition as a
broadcast-nested-loop / cartesian filter: O(|L|·|R|) per key. The
scalable decomposition buckets time at a fixed granularity:

1. each interval explodes into the buckets it covers
   (``len/granularity + 1`` rows — bounded when intervals are bounded);
2. each point row computes its single bucket (map-only);
3. equi-join on (key, bucket) — an ordinary hash/sort-merge join — then
   the exact ``start <= t <= end`` filter.

A point has exactly ONE bucket, so a (point, interval) pair can only
meet once — no post-join dedup shuffle. Bucket granularity trades
interval-replication (long intervals, small buckets) against candidate
false-positives (short buckets filter more); pick it near the median
interval length. Inclusive on both endpoints, matching SQL BETWEEN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def _to_epoch(col):
    return F.col(col).cast("timestamp").cast("double")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner point-in-interval join: left rows × right intervals with
    ``start_col <= left_time <= end_col`` within the same ``on`` key.
    Returns all left columns + all right columns except key/bounds-
    duplicates; callers project what they need."""
    g = float(bucket_seconds)
    l_bucket = F.floor(_to_epoch(left_time) / g)
    r_buckets = F.sequence(
        F.floor(_to_epoch(start_col) / g).cast("long"),
        F.floor(_to_epoch(end_col) / g).cast("long"),
    )

    lt = left.withColumn(_BUCKET, l_bucket.cast("long"))
    rt = right.withColumn(_BUCKET, F.explode(r_buckets))

    overlap = [c for c in rt.columns if c in lt.columns and c not in (on, _BUCKET)]
    if overlap:
        raise ValueError(f"right columns clash with left columns: {sorted(overlap)}")

    joined = lt.join(rt, [on, _BUCKET]).filter(
        (F.col(left_time) >= F.col(start_col))
        & (F.col(left_time) <= F.col(end_col))
    )
    return joined.drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval OVERLAP join: pairs where
    ``[left_start, left_end]`` intersects ``[right_start, right_end]``
    (closed intervals, same optional ``on`` key), i.e.
    ``left_start <= right_end AND left_end >= right_start`` — the
    interval-interval complement of :func:`range_join`'s point-interval
    form.

    Plan: both sides explode into the time buckets they cover, equi-join
    on (key, bucket), verify the exact predicate, then de-duplicate
    pairs that overlap across several shared buckets (one DISTINCT on
    the output — overlapping spans share at most
    ``overlap_len/bucket + 2`` buckets, so the multiplicity is bounded
    by interval length, not data size). Nothing broadcasts; the
    equi-join shuffles on (key, bucket), which also spreads a hot key
    across its time range. Size ``bucket_seconds`` to the typical
    interval length: too small multiplies rows, too large degrades to a
    per-key nested loop (the SQL engines' IEJoin handles this without
    buckets; Spark has no interval join operator — this decomposition
    is the standard workaround).
    """
    g = float(bucket_seconds)
    keys = [on] if on else []
    l_buckets = F.sequence(
        F.floor(_to_epoch(left_start) / g).cast("long"),
        F.floor(_to_epoch(left_end) / g).cast("long"),
    )
    r_buckets = F.sequence(
        F.floor(_to_epoch(right_start) / g).cast("long"),
        F.floor(_to_epoch(right_end) / g).cast("long"),
    )
    lt = left.withColumn(_BUCKET, F.explode(l_buckets))
    rt = right.withColumn(_BUCKET, F.explode(r_buckets))
    overlap = [
        c for c in rt.columns if c in lt.columns and c not in (*keys, _BUCKET)
    ]
    if overlap:
        raise ValueError(f"right columns clash with left columns: {sorted(overlap)}")
    joined = lt.join(rt, [*keys, _BUCKET]).filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(left_end) >= F.col(right_start))
    )
    return joined.drop(_BUCKET).distinct()
