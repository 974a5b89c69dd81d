"""Replica reconciliation via segment digests — the anti-entropy
pattern (Merkle-tree comparison, as in Dynamo/Cassandra repair) for
answering "do these two 100 TB copies of a table differ, and where?"
without shipping either copy.

Reference analog: the closest concept is the MERGE's implicit
source-vs-destination comparison (T5); the reference compares row by
row because both sides share one SQL Server. Across clusters/regions
that is the pattern that does NOT scale — this one does:

1. each side folds to ONE digest row per key segment (order-
   independent sum of row hashes + count): a map-only projection and a
   segment-keyed partial agg, output rows = n_segments, independent of
   table size;
2. digests join (tiny vs tiny) → the list of UNEQUAL segments;
3. only rows of unequal segments (a semi-join prune on both sides —
   at parity this is ~zero rows) reach the key-level full-outer diff.

Network cost at parity: 2 × n_segments digest rows. Divergence cost:
proportional to the divergent slice, not the table. Probabilistic in
the rsync sense: a segment whose row-hash SUM collides despite
differing rows (p ≈ 2^-64 per segment) would be missed; the x174
oracle is the exhaustive full-outer diff, so the fixture run also
certifies no collision occurred.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_hash(cols: list[str]) -> Column:
    # NULL-safe, column-order-fixed row fingerprint
    return F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    )


def segment_digests(
    df: DataFrame, key_col: str, cols: list[str], n_segments: int = 1024
) -> DataFrame:
    """One ``(segment, n_rows, digest)`` row per key segment. The
    digest is an order-independent SUM of per-row xxhash64 values
    (ANSI-safe: summed as decimal so 2^63 overflow cannot raise)."""
    seg = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_segments))
    return (
        df.select(
            seg.alias("segment"),
            _row_hash(cols).cast("decimal(38,0)").alias("__h"),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__h").alias("digest"),
        )
    )


def reconcile(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    n_segments: int = 1024,
) -> DataFrame:
    """Rows differing between two replicas sharing a schema:
    ``(key, status)`` with status ∈ only_left | only_right | modified.
    Only segments whose digests disagree are compared row-level."""
    cols = [c for c in left.columns]
    if set(cols) != set(right.columns):
        raise ValueError("replicas must share a schema")
    dl = segment_digests(left, key_col, cols, n_segments)
    dr = segment_digests(right, key_col, cols, n_segments)
    unequal = (
        dl.alias("l")
        .join(dr.alias("r"), "segment", "full")
        .filter(
            ~(
                F.col("l.n_rows").eqNullSafe(F.col("r.n_rows"))
                & F.col("l.digest").eqNullSafe(F.col("r.digest"))
            )
        )
        .select("segment")
    )
    seg = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_segments))

    def pruned(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("segment", seg)
            .join(F.broadcast(unequal), "segment")
            .drop("segment")
        )
    la = pruned(left).select(
        F.col(key_col).alias("__k"), _row_hash(cols).alias("__hl")
    )
    rb = pruned(right).select(
        F.col(key_col).alias("__k"), _row_hash(cols).alias("__hr")
    )
    return (
        la.join(rb, "__k", "full")
        .select(
            F.col("__k").alias(key_col),
            F.when(F.col("__hr").isNull(), F.lit("only_left"))
            .when(F.col("__hl").isNull(), F.lit("only_right"))
            .when(F.col("__hl") != F.col("__hr"), F.lit("modified"))
            .alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )
