"""Split from the original queries.py (registration order preserved)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dirty_js_etl_spark.catalog import Catalog, fixture_catalog
from dirty_js_etl_spark.functions.combinators import (
    AggregateColumn,
    CaseMap,
    CastAs,
    ConcatColumns,
    CopyOrClear,
    CopyOrDefault,
    DirectCopy,
    ForeignKey,
    InvertBit,
    MergeOn,
    RawValue,
    Sql,
    SqlFunction,
    StaticHash,
    TruncateString,
)
from dirty_js_etl_spark.plans.mapping import MappingSpec, compile_mapping, run_mapping
from dirty_js_etl_spark.plans.runner import Pipeline

from dirty_js_etl_spark.queries._shared import _cat, register
from dirty_js_etl_spark.queries.q03_analytics import _DEC, _disc_price

# ---------------------------------------------------------------------------
# More TPC-H analogs: Q6 / Q10 / Q14 / Q18 shapes on the fixture schema
# ---------------------------------------------------------------------------


@register(
    "x52_tpch_q6",
    """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def x52_tpch_q6(spark, sf_dir):
    # pure filter+agg: every predicate reaches the parquet scan
    li = _cat(spark, sf_dir).read("lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "x53_tpch_q10",
    f"""
SELECT c_custkey, c_name,
       CAST(sum({_DEC}) AS DOUBLE) AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
""",
)
def x53_tpch_q10(spark, sf_dir):
    # returned-item revenue by customer; nation broadcast, facts shuffle
    # once on the join key then once for the agg
    cat = _cat(spark, sf_dir)
    c, o, li, n = (
        cat.read("customer"),
        cat.read("orders"),
        cat.read("lineitem"),
        cat.read("nation"),
    )
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = li.filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "x54_tpch_q14",
    f"""
SELECT CAST(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_DEC}
                              ELSE CAST(0 AS DECIMAL(18,2)) END)
            / sum({_DEC}) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
)
def x54_tpch_q14(spark, sf_dir):
    # promo revenue share: no forced hint on part -- it scales with the
    # data (unlike nation/region); size-based planning broadcasts it
    # while it fits and degrades to a shuffle join when it doesn't, so
    # the same code is right at sf0.1 and at 100 TB
    cat = _cat(spark, sf_dir)
    li = cat.read("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = cat.read("part")
    disc = _disc_price()
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(disc))
            .cast("double")
            .alias("promo_revenue")
        )
    )


@register(
    "x55_tpch_q18",
    """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       sum(l_quantity) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def x55_tpch_q18(spark, sf_dir):
    # large-volume orders. The HAVING pre-agg already IS the final
    # measure: the outer query groups by order attributes, so its
    # sum(l_quantity) per group equals the per-orderkey sum the HAVING
    # computed — joining raw lineitem back and re-aggregating (the
    # pre-r9 shape) shipped 6M rows through a second join for a value
    # already in hand (the sf1 plan built a broadcast hash over the
    # whole lineitem projection). Now: ONE map-side-combined lineitem
    # aggregation, a 1:1 inner join to orders on the filtered aggregate
    # (data-dependent cardinality, no hint — AQE broadcasts it when
    # small), and a customer attach.
    cat = _cat(spark, sf_dir)
    c, o, li = cat.read("customer"), cat.read("orders"), cat.read("lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


