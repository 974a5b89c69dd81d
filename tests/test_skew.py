"""Skew utilities: salted results must equal unsalted results exactly;
the salted plan must join on (key, salt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.skew import salted_join, two_phase_count_distinct


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 7 — the classic whale key
    return spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") % 37).alias("v"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_equals_plain(spark, skewed, dim):
    plain = skewed.join(dim, "k")
    salted = salted_join(skewed, dim, "k", n_salts=8)
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_left_join_equals_plain(spark, skewed, dim):
    small = dim.filter(F.col("k") < 50)  # unmatched big rows exist
    plain = skewed.join(small, "k", "left")
    salted = salted_join(skewed, small, "k", n_salts=4, how="left")
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_join_rejects_right(spark, skewed, dim):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, "k", how="full_outer")


def test_salt_spreads_hot_key(spark, skewed, dim):
    out = salted_join(skewed, dim, "k", n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # join key includes the salt


def test_two_phase_count_distinct(spark, skewed):
    exact = (
        skewed.groupBy("k").agg(F.count_distinct("v").alias("n_distinct"))
    )
    salted = two_phase_count_distinct(skewed, ["k"], "v", n_salts=16)
    assert _sorted(salted) == _sorted(exact)
