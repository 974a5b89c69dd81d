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

# ---------------------------------------------------------------------------
# §2.3 category-checklist extensions: the reference has no windows, sorts/
# top-k, set ops, or date/math functions (SURVEY.md §2.3 "absent" rows);
# the Spark engine provides them natively — one oracle-checked query per
# category so the coverage is checkable.
# ---------------------------------------------------------------------------


@register(
    "x22_topn_orders",
    "SELECT o_orderkey AS okey, o_totalprice AS price FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
)
def x22_topn_orders(spark, sf_dir):
    # sorts/limits/top-k row: orderBy+limit plans as TakeOrdered (per-
    # partition partial top-k, no full sort shuffle)
    orders = _cat(spark, sf_dir).read("orders")
    return (
        orders.select(
            F.col("o_orderkey").alias("okey"), F.col("o_totalprice").alias("price")
        )
        .orderBy(F.col("price").desc(), F.col("okey"))
        .limit(100)
    )


@register(
    "x23_set_ops",
    """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
""",
)
def x23_set_ops(spark, sf_dir):
    cat = _cat(spark, sf_dir)
    c, o = cat.read("customer"), cat.read("orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    open_orders = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    negative = c.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    # SQL set-op precedence: INTERSECT binds tighter; UNION/EXCEPT fold
    # left-to-right — mirrored explicitly here
    return building.intersect(open_orders).union(negative).distinct().exceptAll(
        big.distinct()
    )


@register(
    "x24_window_functions",
    """
SELECT o_custkey AS custkey, o_orderkey AS okey, o_totalprice AS price,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank() OVER w2 AS BIGINT) AS rnk,
       lag(o_totalprice) OVER w AS prev_price,
       round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS UNBOUNDED PRECEDING)::DOUBLE, 2) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def x24_window_functions(spark, sf_dir):
    from pyspark.sql import Window

    orders = _cat(spark, sf_dir).read("orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w2).cast("long").alias("rnk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(running)
            .cast("double"),
            2,
        ).alias("running_total"),
    )


@register(
    "x25_date_functions",
    """
SELECT o_orderkey AS okey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(dayofweek(o_orderdate) AS INT) AS dow,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due,
       datediff('day', DATE '1995-01-01', o_orderdate) AS days_since
FROM orders
""",
)
def x25_date_functions(spark, sf_dir):
    orders = _cat(spark, sf_dir).read("orders")
    return orders.select(
        F.col("o_orderkey").alias("okey"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        # timestamp-typed on both sides: DATE round-trips differently
        # through pandas (datetime64 vs date object)
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
    )


@register(
    "x26_math_functions",
    """
SELECT l_orderkey AS okey, l_linenumber AS line,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net,
       sqrt(l_quantity) AS sq,
       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
       abs(l_quantity - 25) AS dist25,
       round(ln(l_extendedprice), 6) AS log_price,
       pmodemu AS qty_mod_7
FROM (SELECT *, CAST(l_quantity AS BIGINT) % 7 AS pmodemu FROM lineitem)
""",
)
def x26_math_functions(spark, sf_dir):
    li = _cat(spark, sf_dir).read("lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        # decimal arithmetic: double rounding at the .xx5 boundary differs
        # between engines; exact decimals round identically
        F.round(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(18,2)")),
            2,
        )
        .cast("double")
        .alias("net"),
        # raw sqrt: IEEE-754 sqrt is correctly rounded on both
        # engines and l_quantity is integral -- bit-identical, no
        # decimal re-round (kmv discipline)
        F.sqrt("l_quantity").alias("sq"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.abs(F.col("l_quantity") - 25).alias("dist25"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod_7"),
    )


# ---------------------------------------------------------------------------
# TPC-H-style analytical queries (Q1/Q3/Q5 analogs on the fixture star
# schema): multi-join analytics exercising Catalyst's join ordering and
# broadcast decisions, with decimal-exact money arithmetic so the
# cross-engine hashes match.
# ---------------------------------------------------------------------------

_DEC = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _disc_price():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )


@register(
    "x32_tpch_q1",
    f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum({_DEC}) AS DOUBLE) AS sum_disc_price,
       CAST(sum({_DEC} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       sum(l_quantity) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def x32_tpch_q1(spark, sf_dir):
    li = _cat(spark, sf_dir).read("lineitem")
    disc = _disc_price()
    charge = disc * (1 + F.col("l_tax").cast("decimal(18,2)"))
    base = F.col("l_extendedprice").cast("decimal(18,2)")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(base).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / cnt).alias("avg_qty"),
            (F.sum(base).cast("double") / cnt).alias("avg_price"),
            cnt.cast("long").alias("count_order"),
        )
    )


@register(
    "x33_tpch_q3",
    f"""
SELECT l_orderkey AS okey,
       CAST(sum({_DEC}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
""",
)
def x33_tpch_q3(spark, sf_dir):
    cat = _cat(spark, sf_dir)
    cut = F.lit("1998-03-15").cast("timestamp")
    c = cat.read("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = cat.read("orders").filter(F.col("o_orderdate") < cut)
    li = cat.read("lineitem").filter(F.col("l_shipdate") > cut)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("okey"), "o_orderdate", "o_orderpriority"
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("okey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "x34_tpch_q5",
    f"""
SELECT n_name, CAST(sum({_DEC}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def x34_tpch_q5(spark, sf_dir):
    # fact-first join order: lineitem streams as the probe side of
    # every join, so each build side is the genuinely smaller relation
    # (filtered orders, then customer, then supplier). The dim-first
    # spelling ((c⋈o)⋈li) let the static planner build the broadcast
    # hash over the whole pruned LINEITEM (its scan estimate undercut
    # the join-output estimate of c⋈o, and AQE cannot re-plan a
    # compiled broadcast join) — a 6M-entry driver-built hash at sf1
    # and exactly the wrong side to materialize at any scale. No hints:
    # when orders/customer outgrow the threshold at 100 TB these
    # degrade to SMJs on their equi-keys.
    cat = _cat(spark, sf_dir)
    c, o, li = cat.read("customer"), cat.read("orders"), cat.read("lineitem")
    s, n, r = cat.read("supplier"), cat.read("nation"), cat.read("region")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    r = r.filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


