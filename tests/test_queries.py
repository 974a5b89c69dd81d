"""End-to-end oracle parity at sf0.001 for every registered query — the
local mirror of the driver's t2 gate (fast; the full sf0.01 sweep runs via
tools/check_oracle.py)."""

from __future__ import annotations

import pytest

from dirty_js_etl_spark.queries import _REGISTRY
from dirty_js_etl_spark.testing import compare_frames
from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    rq = _REGISTRY[name]
    sdf = rq.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if rq.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    duck_pdf = duck.execute(rq.oracle).fetchdf()
    problems = compare_frames(spark_pdf, duck_pdf)
    assert not problems, problems


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 7


def test_every_query_has_callable_and_name_parity():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_window_rotation_is_mechanical():
    """The driver-verification window derives itself from the committed
    CORRECTNESS_r*.json artifacts: sentinels lead, never-driver-green
    queries come next (registration order), already-green queries trail.
    Guards the round-4 rotation contract (ADVICE r03: rotation must not
    depend on per-round manual edits)."""
    from dirty_js_etl_spark.queries import (
        _SENTINELS,
        _driver_green,
        _window_order,
    )

    order = _window_order()
    assert order[: len(_SENTINELS)] == _SENTINELS
    assert sorted(order) == sorted(_REGISTRY)  # a permutation, no loss
    green = _driver_green()
    tail = order[len(_SENTINELS):]
    # three strictly-ordered bands after the sentinels: pending+oracle,
    # pending rows-only (window slots buy hash checks first, VERDICT r04
    # #4), then already-green
    def band(n):
        if n in green:
            return 2
        return 0 if _REGISTRY[n].oracle else 1

    bands = [band(n) for n in tail]
    assert bands == sorted(bands), "window bands out of order"
    # rows 1-3 artifacts are committed, so the green set is non-trivial;
    # full driver coverage (green == registry) is the steady state once
    # every query has been verified at least once (reached round 6) —
    # the rotation then simply cycles already-green queries
    assert green
