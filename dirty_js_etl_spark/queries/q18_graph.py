"""Graph queries (``operators/graph.py``).

Engine-portable quantized PageRank over the supply graph: directed
edges supplier → customer (a supplier ships to the customers of its
orders), ranks in integer rank-units so every step — the exact integer
division per out-edge, the order-independent integer incoming sums,
the rational damping update — replays bit-for-bit in a static DuckDB
oracle with the iterations unrolled (the x200 quantized-replay move
applied to an iterative graph algorithm)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.queries._shared import _cat, register

_PR_SCALE, _PR_ITERS, _D_NUM, _D_DEN = 1_000_000, 3, 85, 100
_PR_BASE = (_D_DEN - _D_NUM) * _PR_SCALE // _D_DEN


def _pr_iter(prev: str, cur: str) -> str:
    return f"""{cur}_c AS (
  SELECT e.dst AS node, sum(p.rank // d.deg) AS inc
  FROM e JOIN deg d ON e.src = d.src JOIN {prev} p ON p.node = e.src
  GROUP BY e.dst
), {cur} AS (
  SELECT n.node,
         CAST({_PR_BASE} + (coalesce(c.inc, 0) * {_D_NUM}) // {_D_DEN}
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN {cur}_c c ON c.node = n.node
)"""


@register(
    "x212_pagerank_portable",
    f"""
WITH p AS (
  SELECT DISTINCT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), e AS (
  SELECT s AS src, c AS dst FROM p UNION ALL SELECT c, s FROM p
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), deg AS (
  SELECT src, count(*) AS deg FROM e GROUP BY src
), r0 AS (
  SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes
), {_pr_iter("r0", "r1")}, {_pr_iter("r1", "r2")}, {_pr_iter("r2", "r3")}
SELECT node, rank FROM r3
""",
)
def x212_pagerank_portable(spark, sf_dir):
    # supplier<->customer supply graph, BOTH directions (even node ids
    # = suppliers, odd = customers; key spaces overlap, so parity-
    # encode; one-way bipartite would converge after one step — the
    # back edges make rank genuinely circulate). 3 unrolled quantized
    # iterations: rank//deg per out-edge (integer div — exact in any
    # engine), integer incoming sums (order-independent, unlike the
    # float sums that keep float PageRank rows-only), rational damping
    # 85/100. Per iteration: one dst-keyed shuffle + one left join; the
    # edge list localCheckpoints once so the unrolled plan reads a
    # materialized table.
    from dirty_js_etl_spark.operators.graph import pagerank_quantized

    cat = _cat(spark, sf_dir)
    li = cat.read("lineitem").select("l_orderkey", "l_suppkey")
    o = cat.read("orders").select("o_orderkey", "o_custkey")
    pairs = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        (F.col("l_suppkey") * 2).alias("s"),
        (F.col("o_custkey") * 2 + 1).alias("c"),
    )
    edges = pairs.select(
        F.col("s").alias("src"), F.col("c").alias("dst")
    ).unionByName(pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")))
    return pagerank_quantized(
        edges,
        iters=_PR_ITERS,
        scale=_PR_SCALE,
        d_num=_D_NUM,
        d_den=_D_DEN,
    )
