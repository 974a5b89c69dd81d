"""Declarative expectations (operators/expectations.py): violation
counting, NULL-as-violation contract, key uniqueness, single-pass plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.expectations import (
    Expectation,
    not_null,
    unique_key,
    validate,
)


def test_violation_counts_and_null_contract(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (3, 7.0)],
        "id int, v double",
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["ok"])
        for r in validate(
            df,
            [
                Expectation("v_positive", F.col("v") > 0),  # NULL -> violation
                not_null("v"),
                unique_key("id"),
            ],
        ).collect()
    }
    assert out["v_positive"] == (4, 2, False)   # -5 and NULL
    assert out["v_not_null"] == (4, 1, False)
    assert out["unique_id"] == (4, 2, False)    # both id=3 rows count


def test_all_pass(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double")
    out = validate(
        df, [Expectation("v_pos", F.col("v") > 0), unique_key("id")]
    )
    assert all(r["ok"] for r in out.collect())


def test_row_rules_fold_into_one_aggregate(spark):
    df = spark.createDataFrame([(1, 1.0)], "id int, v double")
    out = validate(
        df,
        [
            Expectation("a", F.col("v") > 0),
            Expectation("b", F.col("v") < 100),
            Expectation("c", F.col("id") > 0),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # 3 row rules -> still one scan: no union, one aggregate pair
    assert "Union" not in plan
