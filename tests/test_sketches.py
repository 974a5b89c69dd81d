"""Sketch aggregations: approximate answers must sit inside their
declared error bounds of the exact answers (the correctness contract a
SQL oracle can't express for engine-specific sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.queries import all_queries

SF = "/root/testdata/sf0.001"  # same dir as the conftest catalog fixture


def test_sketches_within_bounds(spark, catalog):
    approx = {
        r["event_type"]: r
        for r in all_queries()["x35_sketches"](spark, SF).collect()
    }
    events = catalog.read("events")
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        # HLL++ at rsd=2%: allow 5x margin for the small fixture
        assert abs(a["approx_users"] - e["users"]) <= max(0.10 * e["users"], 2)
        # quantile sketches: within a small value-space neighborhood
        assert abs(a["p50"] - e["p50"]) <= 0.05 * max(abs(e["p50"]), 1)
        assert abs(a["p95"] - e["p95"]) <= 0.05 * max(abs(e["p95"]), 1)


def test_sketch_rollup_merge_error_bounded(spark):
    from dirty_js_etl_spark.queries import all_queries
    from tests.conftest import SF_DIR

    got = {
        r["week_idx"]: r["approx_weekly_users"]
        for r in all_queries()["x144_sketch_rollup"](spark, SF_DIR).collect()
    }
    from pyspark.sql import functions as F

    from dirty_js_etl_spark.catalog import fixture_catalog

    ev = fixture_catalog(spark, SF_DIR).read("events")

    exact = {
        r["week_idx"]: r["n"]
        for r in ev.groupBy(
            (
                F.datediff(
                    F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
                )
                / F.lit(7)
            )
            .cast("int")
            .alias("week_idx")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for w, est in got.items():
        assert abs(est - exact[w]) / exact[w] <= 0.05, (w, est, exact[w])
