"""Deterministic dataset splitting for training-data pipelines
(north-star extension — no reference analog; nearest concept is the
reference's generation-time ``StaticHash`` literal, ``mappr.js:236-246``,
which also derives stable values from hashing).

Scale design:

- The split is a **pure projection** over an md5 of the row id — no
  shuffle, no RNG state, whole-stage codegen. Any executor computes the
  same label for the same row, so the assignment is stable across runs,
  retries, and cluster sizes (unlike ``df.randomSplit``, whose output
  depends on partitioning).
- md5 rather than ``xxhash64``/``F.hash`` so an external system (or the
  DuckDB oracle) can reproduce the assignment from the id alone.
- Buckets are uniform over [0, n_buckets); split boundaries are
  cumulative-weight thresholds, so train/val/test fractions hold in
  expectation per partition, not just globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, n_buckets) from the first 8 hex
    digits of ``md5(cast(id as string))``. Engine-portable: DuckDB spells
    the same thing ``CAST('0x' || substring(md5(id::VARCHAR),1,8) AS
    BIGINT) % n``."""
    hex8 = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("bigint") % n_buckets).cast("int")


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    n_buckets: int = 100,
    split_col: str = "split",
) -> DataFrame:
    """Adds a stable ``split`` column ('train' | 'val' | 'test') keyed only
    on ``id_col``. Boundaries are integer bucket thresholds so the same
    row always lands in the same split."""
    total = sum(weights)
    train_hi = int(round(weights[0] / total * n_buckets))
    val_hi = train_hi + int(round(weights[1] / total * n_buckets))
    b = hash_bucket(F.col(id_col), n_buckets)
    label = (
        F.when(b < train_hi, F.lit("train"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, label)
