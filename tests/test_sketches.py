"""Sketch aggregations: approximate answers must sit inside their
declared error bounds of the exact answers (the correctness contract a
SQL oracle can't express for engine-specific sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.queries import all_queries
from tests.conftest import SF_DIR

SF = "/root/testdata/sf0.001"  # same dir as the conftest catalog fixture


def test_sketches_within_bounds(spark, catalog):
    approx = {
        r["event_type"]: r
        for r in all_queries()["x35b_sketch_estimates"](spark, SF).collect()
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


def test_kll_rollup_error_bound_vs_exact(spark, catalog):
    from dirty_js_etl_spark import queries as Q

    sf = SF_DIR
    approx = {
        r["week"]: (r["n"], r["p50_approx"], r["p95_approx"])
        for r in Q._REGISTRY["x182_kll_quantile_rollup"].fn(spark, sf).collect()
    }
    ev = catalog.read("events").filter(F.col("event_type") == "purchase")
    exact = {
        r["week"]: (r["n"], r["p50"], r["p95"])
        for r in ev.groupBy(F.weekofyear(F.col("ts").cast("date")).alias("week"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for wk, (n, p50, p95) in exact.items():
        an, a50, a95 = approx[wk]
        assert an == n  # KLL n is exact
        # KLL rank error default ~1.7%; value-space tolerance: the
        # approximate quantile must sit within the exact p45–p55 /
        # p90–p99 bands
        # robust value-space check: within exact p40–p60 / p88–p100 bands
        band = ev.filter(
            F.weekofyear(F.col("ts").cast("date")) == wk
        ).agg(
            F.expr("percentile(value, 0.40)").alias("lo"),
            F.expr("percentile(value, 0.60)").alias("hi"),
            F.expr("percentile(value, 0.88)").alias("lo95"),
            F.expr("percentile(value, 1.0)").alias("hi95"),
        ).collect()[0]
        assert band["lo"] <= a50 <= band["hi"], (wk, a50, band)
        assert band["lo95"] <= a95 <= band["hi95"], (wk, a95, band)


def test_theta_overlap_error_bound_vs_exact(spark, catalog):
    from dirty_js_etl_spark import queries as Q

    got = Q._REGISTRY["x183_theta_audience_overlap"].fn(spark, SF_DIR).collect()[0]
    ev = catalog.read("events")
    viewers = {
        r[0] for r in ev.filter("event_type = 'view'").select("user_id").distinct().collect()
    }
    purch = {
        r[0] for r in ev.filter("event_type = 'purchase'").select("user_id").distinct().collect()
    }
    def close(a, e):
        return abs(a - e) <= max(2, 0.05 * e)
    assert close(got["viewers"], len(viewers))
    assert close(got["purchasers"], len(purch))
    assert close(got["overlap_approx"], len(viewers & purch))
    assert close(got["view_only_approx"], len(viewers - purch))
