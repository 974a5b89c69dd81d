"""Skew mitigation: salted joins and two-phase distinct aggregation.

AQE's skew-join split (enabled in session defaults) handles most skew
at runtime, but it only applies to sort-merge joins in inner/left/right
shapes and never to aggregations or windows. These utilities cover the
gaps with the classic salting decompositions:

- :func:`salted_join` — a hot join key lands in ONE shuffle partition
  under plain hashing; salting the big side into ``n_salts`` synthetic
  sub-keys and replicating the small side once per salt spreads that
  key across ``n_salts`` partitions. Replication cost: |small| ×
  n_salts rows — use when the small side is modest but too big (or the
  join type wrong) for a broadcast.
- :func:`two_phase_count_distinct` — COUNT(DISTINCT x) BY key shuffles
  every (key, x) pair to the key's single reducer. Phase 1 groups by
  (key, hash(x) % n): x values are partitioned by their own hash, so
  each distinct value is counted in exactly one bucket — partials sum
  exactly in phase 2. The whale key's work spreads n-ways.

Results are identical to the unsalted equivalents (property-tested);
only the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted ``n_salts`` ways and the small
    side replicated per salt. Supported ``how``: inner, left (the big
    side must be the preserved side — a salted right/full join would
    null-extend each salt replica)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    # deterministic per-row salt from the whole row (any spread works —
    # correctness never depends on salt values)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn(_SALT, salt)
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, keys + [_SALT], how).drop(_SALT)


def two_phase_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT col) grouped by keys, skew-spread two-phase."""
    bucket = F.pmod(F.xxhash64(F.col(col)), F.lit(n_salts))
    partial = (
        df.groupBy(*keys, bucket.alias(_SALT))
        .agg(F.count_distinct(F.col(col)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__partial").alias(out_col)
    )
