"""Iterative graph algorithms as DataFrame loops — here an
engine-portable, integer-quantized PageRank.

Reference scope note: the reference engine has no graph concept at all
(nearest idea: the FK lookup join, ``mappr.js:283-307``); this module is
SURVEY.md §2.3 extension surface, next to the pointer-jumping connected
components (``dedup.dup_clusters``) and hierarchy flattening
(``hierarchy.py``).

Why a QUANTIZED PageRank: float PageRank sums per-node contributions
across group ROWS, and parallel float addition is order-dependent — the
same reason the k-means family was rows-only until x200. Keeping ranks
in integer "rank units" makes every step exact in any engine:

- ranks start at ``scale`` units per node (a 64-bit int);
- each node sends ``floor(rank / out_degree)`` units along each
  out-edge (exact integer division; the dust — at most out_degree−1
  units — is dropped, the standard quantized-PageRank simplification);
- per-node incoming sums are INTEGER sums (associative, commutative —
  order-independent, unlike float);
- the damping update is ``floor((1−d)·scale) + floor(d·incoming)``
  with d as an exact rational (``d_num/d_den``, default 85/100), so it
  stays in integer arithmetic end to end.

Dangling nodes (no out-edges) keep only their teleport share — their
rank is not redistributed (documented simplification; redistribution
adds a global scalar that is also integer-exact if ever needed).

Scale shape: one edges shuffle to build out-degrees, then per iteration
one (dst-keyed) shuffle for the incoming sums and one left join back to
the node list — all narrow (two longs per row). Iterations are UNROLLED
(the caller picks a small fixed count), so a static SQL oracle replays
the whole run bit-for-bit; the edge list is localCheckpointed once so
the unrolled plan re-reads a materialized table instead of re-deriving
the edges ``iters`` times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pagerank_quantized(
    edges: DataFrame,
    src_col: str | Column = "src",
    dst_col: str | Column = "dst",
    iters: int = 3,
    scale: int = 1_000_000,
    d_num: int = 85,
    d_den: int = 100,
) -> DataFrame:
    """(node, rank) after ``iters`` exact integer PageRank steps over
    the distinct directed edge list. rank is BIGINT rank-units
    (initial = ``scale``); nodes = every src or dst."""
    e = edges.select(
        (F.col(src_col) if isinstance(src_col, str) else src_col)
        .cast("long")
        .alias("src"),
        (F.col(dst_col) if isinstance(dst_col, str) else dst_col)
        .cast("long")
        .alias("dst"),
    ).distinct()
    # materialize once, WITH the out-degree already attached and the
    # rows hashed by src: the unrolled iterations would otherwise
    # replay the edge derivation (scan + join + distinct) and the
    # degree join `iters` times, and the src partitioning lets each
    # iteration's rank join reuse the checkpointed layout instead of
    # re-shuffling the edge table
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = e.join(deg, "src").repartition("src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
    )
    # LAZY (r14 job-floor audit): nodes derives from the already-
    # materialized edge table by one tiny distinct, so its own blocking
    # job bought nothing; the first consuming stage materializes it. A
    # concurrent-stage race would at worst recompute the small distinct
    # over checkpointed blocks (cheap), never the edge derivation.
    nodes = nodes.localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    base = (d_den - d_num) * scale // d_den
    for _ in range(iters):
        contrib = e.join(ranks.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"),
            # `div` is INTEGER division on longs (Spark) — exact, unlike
            # `/` which would round-trip through IEEE double
            F.expr("rank div deg").alias("c"),
        )
        # dangling/zero-incoming nodes used to re-attach via
        # ``nodes LEFT JOIN groupBy(contrib)`` — an extra exchange + sort
        # per iteration (r13 profile: the unrolled plan carried three
        # exchanges per step). Unioning an explicit 0-contribution row
        # per node folds the re-attach INTO the aggregation: one shuffle
        # computes the same integer sums (sum over contribs ∪ {0} ==
        # coalesce(sum over contribs, 0), and contrib nodes ⊆ nodes), so
        # each step is exactly two exchanges (ranks→src, contribs→node).
        ranks = (
            contrib.unionByName(
                nodes.select("node", F.lit(0).cast("long").alias("c"))
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(f"(inc * {d_num}) div {d_den}")
                ).alias("rank"),
            )
        )
    return ranks
