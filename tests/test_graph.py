"""Semantics of the quantized PageRank (operators/graph.py)."""

from __future__ import annotations

from dirty_js_etl_spark.operators.graph import pagerank_quantized


def _edges(spark):
    # 1 -> {2, 3}, 2 -> 1; 3 is dangling
    return spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1)], "src long, dst long"
    )


def test_pagerank_hand_computed(spark):
    # scale=1000, d=85/100, base=150. iter1: r=(1000,575,575);
    # iter2: node1 gets 575//1 from 2 -> 150+(575*85)//100=638,
    # nodes 2,3 each get 1000//2 from 1 -> 150+425=575.
    got = {
        r.node: r.rank
        for r in pagerank_quantized(
            _edges(spark), iters=2, scale=1000
        ).collect()
    }
    assert got == {1: 638, 2: 575, 3: 575}


def test_pagerank_dangling_keeps_teleport_only(spark):
    # a node with no out-edges receives but never sends: its rank is
    # base + damped inflow, and totals are NOT conserved (documented)
    got = {
        r.node: r.rank
        for r in pagerank_quantized(
            _edges(spark), iters=1, scale=1000
        ).collect()
    }
    assert got[3] == 150 + (500 * 85) // 100  # inflow only


def test_pagerank_partition_invariant(spark):
    a = sorted(
        map(tuple, pagerank_quantized(_edges(spark), iters=3).collect())
    )
    b = sorted(
        map(
            tuple,
            pagerank_quantized(
                _edges(spark).repartition(7), iters=3
            ).collect(),
        )
    )
    assert a == b


def test_pagerank_dedups_edges(spark):
    # duplicate edge rows must not double out-degree or inflow
    import pyspark.sql.functions as F

    dup = _edges(spark).union(_edges(spark))
    a = sorted(map(tuple, pagerank_quantized(dup, iters=2, scale=1000).collect()))
    b = sorted(
        map(tuple, pagerank_quantized(_edges(spark), iters=2, scale=1000).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# hypothesis property vs a pure-Python integer reference
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=15,
    ),
    iters=st.sampled_from([1, 2, 3]),
)
def test_pagerank_matches_python_reference(spark, edges, iters):
    """Random small digraphs (self-loops, duplicate edges, dangling
    nodes, disconnected bits) vs a dict-based exact-integer reference:
    the quantized contract is bit-reproducible in ANY implementation,
    so the distributed loop must equal the sequential one exactly."""
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank_quantized(df, iters=iters, scale=1000).collect()
    }
    es = sorted(set(edges))
    nodes = sorted({n for e in es for n in e})
    deg = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: 1000 for n in nodes}
    base = (100 - 85) * 1000 // 100
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d in es:
            inc[d] += rank[s] // deg[s]
        rank = {n: base + (inc[n] * 85) // 100 for n in nodes}
    assert got == rank
