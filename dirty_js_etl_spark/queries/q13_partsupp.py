"""TPC-H Q2 / Q9 / Q11 / Q20 analogs over a DERIVED partsupp dimension.

The fixture star schema carries no ``partsupp`` table, which is the one
input the four remaining TPC-H shapes (min-cost supplier, product-profit,
important-stock, excess-stock) all need. Rather than leave those shapes
uncovered, this module derives partsupp deterministically from the keys
the fixtures DO carry — the same move dbgen itself makes (partsupp rows
are a pure function of p_partkey and the supplier count):

- each part gets up to 4 suppliers: ``si = (p_partkey*13 + i*7 + 1) mod
  S`` for ``i`` in 0..3, deduped per part (``array_distinct`` on the
  offsets, so the (partkey, suppkey) PK holds at ANY supplier count,
  not just S > 21), mapped to real supplier keys through a driver-side
  sorted collect of the supplier keys (dim-sized by TPC-H definition),
  so the derivation survives non-contiguous key spaces (the sf1
  replica offsets);
- ``ps_availqty`` / ``ps_supplycost`` are md5-derived functions of the
  (partkey, suppkey) PAIR, not of the derived rows — so Q9 can price any
  lineitem's own (l_partkey, l_suppkey) directly, exactly like TPC-H
  where every lineitem pair exists in partsupp. Costs are
  ``(h mod 99900 + 100) / 100.0`` — one correctly-rounded IEEE division
  of an integer, identical bits in Spark and DuckDB (the x100 spelling).

Both engines rebuild the dimension from the same literal arithmetic, so
all four queries are fully hash-checked — no fixture regeneration, no
rows-only compromise. With these, all 22 TPC-H query shapes have
analogs on the fixture schema (Q1,Q3..Q8,Q10,Q12..Q22 live in
q03/q05/q08/q10/q11/q12 modules).

Scale notes (100 TB): the supplier-key rank is a bounded driver-side
collect of the sorted supplier keys (dim-sized by TPC-H definition —
this is fixture-synthesis shimming for a table the driver doesn't ship,
not a query-path pattern; it replaced an unpartitioned rank window that
single-threaded the sf1 run); partsupp itself is ≤4×|part| rows built
map-side from a broadcast of the (s_suppkey, si) pairs — no corpus
shuffle. Q9's only big-table shuffle
is lineitem⋈orders (AQE-planned); part/supplier/nation sides are
broadcast. Q2 pre-filters partsupp to the filtered parts BEFORE the
per-part min window (legal because the min is per-part and the filter is
part-level), so the window shuffles only the surviving sliver.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dirty_js_etl_spark.queries._shared import _cat, register
from dirty_js_etl_spark.queries.q03_analytics import _DEC, _disc_price

# ---------------------------------------------------------------------------
# The derived-partsupp dimension (shared by both engines)
# ---------------------------------------------------------------------------

# DuckDB spelling of the pair-keyed attribute functions.
_SQL_H = (
    "CAST('0x' || substring(md5(CAST({pk} AS VARCHAR) || ':' || "
    "CAST({sk} AS VARCHAR)), {pos}, 8) AS BIGINT)"
)


def _sql_availqty(pk: str, sk: str) -> str:
    return f"CAST({_SQL_H.format(pk=pk, sk=sk, pos=1)} % 9999 + 1 AS INT)"


def _sql_supplycost(pk: str, sk: str) -> str:
    return (
        f"CAST({_SQL_H.format(pk=pk, sk=sk, pos=9)} % 99900 + 100 AS DOUBLE)"
        " / CAST(100 AS DOUBLE)"
    )


# The shared WITH-prefix: supplier rank, supplier count, derived partsupp.
_SQL_PARTSUPP = f"""
WITH sup_i AS (
  SELECT s_suppkey, s_nationkey, s_name, s_acctbal,
         row_number() OVER (ORDER BY s_suppkey) - 1 AS si
  FROM supplier
), scount AS (SELECT count(*) AS s_cnt FROM supplier),
partsupp AS (
  SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey,
         {_sql_availqty('p_partkey', 's_suppkey')} AS ps_availqty,
         {_sql_supplycost('p_partkey', 's_suppkey')} AS ps_supplycost
  FROM (SELECT p_partkey,
               UNNEST(list_distinct([(p_partkey * 13 + 1) % s_cnt,
                                     (p_partkey * 13 + 8) % s_cnt,
                                     (p_partkey * 13 + 15) % s_cnt,
                                     (p_partkey * 13 + 22) % s_cnt])) AS si
        FROM part CROSS JOIN scount) pr
  JOIN sup_i USING (si)
)
"""


def _ps_hex(pk, sk):
    return F.md5(F.concat(pk.cast("string"), F.lit(":"), sk.cast("string")))


def _ps_availqty(pk, sk):
    h = F.conv(F.substring(_ps_hex(pk, sk), 1, 8), 16, 10).cast("bigint")
    return (h % 9999 + 1).cast("int")


def _ps_supplycost(pk, sk):
    h = F.conv(F.substring(_ps_hex(pk, sk), 9, 8), 16, 10).cast("bigint")
    return (h % 99900 + 100).cast("double") / F.lit(100).cast("double")


def _derived_partsupp(cat, part=None):
    """partsupp rows for ``part`` (default: the whole part table).

    Passing a pre-filtered part frame keeps the derivation map-side over
    exactly the parts a query needs — the broadcast (si -> s_suppkey)
    rank table is the only other input.

    The supplier rank is built from a driver-side collect of the sorted
    supplier keys, NOT a global ``row_number()`` window: supplier is
    dim-sized by definition (TPC-H: 0.01% of lineitem), so the collect
    is bounded, while an unpartitioned window moves the frame to one
    partition and fires ``WindowExec: No Partition Defined`` on every
    Q2/Q9/Q11/Q20 run (VERDICT r07 task 6). The collect also makes
    ``s_cnt`` a plan literal, so the pmod needs no 1-row count join.
    The four si offsets are deduped map-side via ``array_distinct`` so
    the (ps_partkey, ps_suppkey) primary-key invariant holds even when
    the supplier count divides 7, 14, or 21 (ADVICE r07) — at fixture
    scales the offsets are already distinct and results are unchanged.
    """
    supplier = cat.read("supplier")
    skeys = sorted(r[0] for r in supplier.select("s_suppkey").collect())
    s_cnt = len(skeys)
    sup_i = supplier.sparkSession.createDataFrame(
        [(i, k) for i, k in enumerate(skeys)], "si long, s_suppkey long"
    )
    if part is None:
        part = cat.read("part")
    pk = F.col("p_partkey")
    pairs = (
        part.select("p_partkey")
        .select(
            "p_partkey",
            F.explode(
                F.array_distinct(
                    F.array(
                        *[
                            F.pmod(pk * 13 + i * 7 + 1, F.lit(s_cnt)).cast(
                                "long"
                            )
                            for i in range(4)
                        ]
                    )
                )
            ).alias("si"),
        )
        .join(F.broadcast(sup_i), "si")
    )
    pk, sk = F.col("p_partkey"), F.col("s_suppkey")
    return pairs.select(
        pk.alias("ps_partkey"),
        sk.alias("ps_suppkey"),
        _ps_availqty(pk, sk).alias("ps_availqty"),
        _ps_supplycost(pk, sk).alias("ps_supplycost"),
    )


# ---------------------------------------------------------------------------
# Q2: min-cost supplier per part within a region
# ---------------------------------------------------------------------------


@register(
    "x194_tpch_q2",
    _SQL_PARTSUPP
    + """
, eu AS (
  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
  FROM partsupp
  JOIN sup_i ON sup_i.s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), flt AS (
  SELECT eu.* FROM eu
  JOIN part ON p_partkey = ps_partkey
  WHERE p_size <= 15 AND p_type = 'STANDARD'
), best AS (
  SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM flt GROUP BY ps_partkey
)
SELECT s_acctbal, s_name, n_name, flt.ps_partkey AS p_partkey, ps_supplycost
FROM flt JOIN best ON flt.ps_partkey = best.ps_partkey
                  AND flt.ps_supplycost = best.min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
""",
)
def x194_tpch_q2(spark, sf_dir):
    # Q2 shape: per-part min over the region's suppliers, top-100 by
    # account balance. The part-level filter commutes with the per-part
    # min, so partsupp is derived only for the filtered parts and the
    # min-window shuffles just that sliver (one shuffle by ps_partkey);
    # supplier/nation/region attach by broadcast. The ORDER BY carries
    # (s_name, p_partkey) — unique per result row — so LIMIT 100 is a
    # deterministic TakeOrdered, never a tie gamble.
    cat = _cat(spark, sf_dir)
    part = cat.read("part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    ps = _derived_partsupp(cat, part=part)
    nat = cat.read("nation")
    reg = cat.read("region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        cat.read("supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    flt = ps.join(
        F.broadcast(eu_sup), ps.ps_suppkey == eu_sup.s_suppkey
    )
    w = Window.partitionBy("ps_partkey")
    best = flt.withColumn(
        "min_cost", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("min_cost"))
    return (
        best.select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "ps_supplycost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "x195_tpch_q9",
    f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum({_DEC}
            - CAST({_sql_supplycost('l_partkey', 'l_suppkey')} AS DECIMAL(18,2))
              * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
""",
)
def x195_tpch_q9(spark, sf_dir):
    # Q9 shape: profit = disc price minus supply cost, by supplier nation
    # and order year. Supply cost is the pair-keyed hash function applied
    # to lineitem's OWN (l_partkey, l_suppkey) — exactly TPC-H's "every
    # lineitem pair exists in partsupp", with no partsupp join at all.
    # lineitem⋈orders is the one big-table shuffle; part (name-filtered)
    # and supplier/nation broadcast. Money stays DECIMAL(18,2)-exact
    # until the final double cast.
    cat = _cat(spark, sf_dir)
    li = cat.read("lineitem")
    red = (
        cat.read("part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    sup = cat.read("supplier").select("s_suppkey", "s_nationkey")
    nat = cat.read("nation").select("n_nationkey", "n_name")
    orders = cat.read("orders").select("o_orderkey", "o_orderdate")
    cost = _ps_supplycost(F.col("l_partkey"), F.col("l_suppkey"))
    amount = _disc_price() - cost.cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11: important stock within one nation
# ---------------------------------------------------------------------------


@register(
    "x196_tpch_q11",
    _SQL_PARTSUPP
    + """
, nps AS (
  SELECT ps_partkey,
         sum(CAST(ps_supplycost AS DECIMAL(18,2))
             * CAST(ps_availqty AS DECIMAL(18,2))) AS val
  FROM partsupp
  JOIN sup_i ON sup_i.s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY ps_partkey
), tot AS (SELECT sum(val) AS total, count(*) AS n_parts FROM nps)
SELECT ps_partkey AS p_partkey, CAST(val AS DOUBLE) AS value
FROM nps CROSS JOIN tot WHERE val * n_parts > 2 * total
""",
)
def x196_tpch_q11(spark, sf_dir):
    # Q11 shape: per-part stock value within one nation, keep parts worth
    # more than twice the nation's per-part average (TPC-H's fixed
    # fraction scales as 1/SF — this is the scale-invariant spelling, so
    # the query stays non-degenerate at every fixture scale). The share
    # test is val*n > 2*total — DECIMAL×integer, exact in both engines
    # (never a decimal division, whose scale rules differ). The nation
    # total is a broadcast 1-row aggregate; one groupBy(ps_partkey)
    # shuffle.
    cat = _cat(spark, sf_dir)
    nat = cat.read("nation").filter(F.col("n_name") == "NATION_7")
    nsup = (
        cat.read("supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    ps = _derived_partsupp(cat)
    val = F.col("ps_supplycost").cast("decimal(18,2)") * F.col(
        "ps_availqty"
    ).cast("decimal(18,2)")
    nps = (
        ps.join(F.broadcast(nsup), ps.ps_suppkey == nsup.s_suppkey)
        .groupBy("ps_partkey")
        .agg(F.sum(val).alias("val"))
    )
    tot = nps.agg(
        F.sum("val").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        nps.crossJoin(F.broadcast(tot))
        .filter(F.col("val") * F.col("n_parts") > 2 * F.col("total"))
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# Q20: suppliers with excess stock of a part family
# ---------------------------------------------------------------------------


@register(
    "x197_tpch_q20",
    f"""
WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
shipped AS (
  SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
  FROM lineitem JOIN red ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
), excess AS (
  SELECT DISTINCT l_suppkey AS suppkey FROM shipped
  WHERE {_sql_availqty('l_partkey', 'l_suppkey')} > half_qty
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN excess ON suppkey = s_suppkey
WHERE n_name = 'NATION_3'
""",
)
def x197_tpch_q20(spark, sf_dir):
    # Q20 shape: suppliers in one nation whose stock of 'red' parts
    # exceeds half of what they shipped in 1996. availqty is the
    # pair-keyed hash function on the shipped pair itself (TPC-H's
    # correlated IN decorated the same way); pairs with no 1996
    # shipments drop out exactly as TPC-H's NULL comparison does.
    # Shape: year filter pushed to the lineitem scan, part filter
    # broadcast-semi, one groupBy(pair) shuffle, then a left-semi
    # against the dim-sized supplier table. half = 0.5 × an exact
    # integral sum — exact in IEEE double in both engines.
    cat = _cat(spark, sf_dir)
    red = (
        cat.read("part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        cat.read("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    shipped = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    excess = (
        shipped.filter(
            _ps_availqty(F.col("l_partkey"), F.col("l_suppkey"))
            > F.col("half_qty")
        )
        .select("l_suppkey")
        .distinct()
    )
    nat = cat.read("nation").filter(F.col("n_name") == "NATION_3")
    return (
        cat.read("supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            excess, F.col("s_suppkey") == excess.l_suppkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
    )
