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
