"""Hierarchy flattening (operators/hierarchy.py): hand-built forest,
deep-chain convergence in log rounds, and cycle detection."""

from __future__ import annotations

import pytest

from dirty_js_etl_spark.operators.hierarchy import flatten_hierarchy


def test_forest_roots_and_depths(spark):
    # two trees: 1 <- 2 <- 4, 1 <- 3 ; 10 (isolated root)
    edges = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1), (4, 2), (10, None)],
        "id long, parent long",
    )
    got = {
        r["id"]: (r["root"], r["depth"])
        for r in flatten_hierarchy(edges).collect()
    }
    assert got == {
        1: (1, 0), 2: (1, 1), 3: (1, 1), 4: (1, 2), 10: (10, 0)
    }


def test_deep_chain_converges_logarithmically(spark):
    # a 200-node chain needs ceil(log2(200)) = 8 doubling rounds; give
    # it exactly 9 (8 + the final all-resolved probe) and it must pass
    n = 200
    edges = spark.createDataFrame(
        [(i, i - 1 if i > 0 else None) for i in range(n)],
        "id long, parent long",
    )
    got = {
        r["id"]: (r["root"], r["depth"])
        for r in flatten_hierarchy(edges, max_iterations=9).collect()
    }
    assert got[n - 1] == (0, n - 1) and got[0] == (0, 0)


def test_cycle_raises(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "id long, parent long"
    )
    with pytest.raises(RuntimeError, match="cycle|doubling"):
        flatten_hierarchy(edges, max_iterations=5)
