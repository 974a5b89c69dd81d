"""Physical-layout operators: multi-dimensional clustering for
data-skipping at scale.

The reference never manages physical layout (it emits T-SQL and lets
SQL Server store rows; SURVEY.md §4.1). At 100 TB on object storage,
layout IS performance: parquet footer min/max stats prune row groups
only if rows that are close in the predicate space are close in the
file order. ``write_clustered`` delivers that for multi-column
predicates via a Morton (Z-order) key:

1. bucketize each clustering column to ``bits``-bit ranks (range-stable
   integer quantiles via ``ntile`` — resilient to skew and scale);
2. interleave the bits into one Z-key (pure integer arithmetic — the
   same formula the x119 query cross-checks against DuckDB);
3. ``repartitionByRange`` on the key (range partitioner → files own
   disjoint key ranges) + ``sortWithinPartitions`` (row groups within a
   file own disjoint sub-ranges).

A predicate on ANY prefix-subset of the clustered columns then touches
only the files whose Z-range intersects it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already bucketized,
    non-negative) column into a Morton key. Integer-only arithmetic."""
    n = len(cols)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.floor(c.cast("bigint") / F.lit(2**i)) % 2
            key = key + bit * F.lit(2 ** (i * n + j))
    return key


def rank_bucketize(df: DataFrame, col: str, bits: int = 8) -> Column:
    """Equi-depth bucket rank of ``col`` in [0, 2^bits): an ntile over
    the column's order, so arbitrary value distributions (skew, outliers)
    still spread uniformly across the Z-space."""
    w = Window.orderBy(F.col(col))
    return (F.ntile(2**bits).over(w) - 1).cast("bigint")


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of
    ``cluster_cols``: ``n_files`` range-partitioned, internally sorted
    files with disjoint Z-ranges (verified by test_layout.py).

    The ntile bucketize is a global sort of the CLUSTER KEY projection
    only; at 100 TB replace it with approxQuantile-derived bucket
    boundaries (sampled, no global sort) — same Z-math downstream.
    """
    zcols = [rank_bucketize(df, c, bits) for c in cluster_cols]
    keyed = df.withColumn("__z", zorder_key(zcols, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
