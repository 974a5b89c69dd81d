"""Privacy-release gate queries (``operators/privacy.py``).

Structured-data counterpart of the free-text PII layer (x51): before a
table with quasi-identifiers ships in a training corpus, every released
equivalence class must be k-anonymous, and k-anonymous classes must
carry diverse sensitive values (l-diversity). Both are pure
groupBy/broadcast shapes — exactly SQL-replayable, so the oracles
hash-check them end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.queries._shared import _cat, register


@register(
    "x198_k_anonymity",
    """
WITH fine AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS INT) AS bal_band,
         count(*) AS n
  FROM customer GROUP BY 1, 2, 3
), coarse AS (
  SELECT (n_regionkey IS NOT NULL) AS mapped,
         COALESCE(n_regionkey, c_nationkey) AS geo, c_mktsegment,
         CAST(sum(n) AS BIGINT) AS n
  FROM fine LEFT JOIN nation ON c_nationkey = n_nationkey
  WHERE n < 5
  GROUP BY 1, 2, 3
)
SELECT 'fine' AS level, c_nationkey AS geo, c_mktsegment AS segment,
       bal_band, CAST(n AS BIGINT) AS n
FROM fine WHERE n >= 5
UNION ALL
SELECT CASE WHEN mapped AND n >= 5 THEN 'coarse' ELSE 'suppressed' END
         AS level,
       geo, c_mktsegment AS segment, CAST(NULL AS INT) AS bal_band, n
FROM coarse
""",
)
def x198_k_anonymity(spark, sf_dir):
    # k-anonymity with one generalization step over the customer
    # quasi-identifiers (nation, segment, $1000 balance band): classes
    # of >= 5 release fine-grained; smaller ones generalize nation ->
    # region and drop the band, releasing at 'coarse' or reporting
    # 'suppressed'. The coarse pass aggregates the fine CLASSES (never
    # re-scans raw rows); the nation->region hierarchy broadcasts.
    from dirty_js_etl_spark.operators.privacy import k_anonymity_report

    cat = _cat(spark, sf_dir)
    return k_anonymity_report(
        cat.read("customer"),
        geo_col="c_nationkey",
        seg_col="c_mktsegment",
        band=F.floor(F.col("c_acctbal") / 1000).cast("int"),
        hierarchy=cat.read("nation").select("n_nationkey", "n_regionkey"),
        child_col="n_nationkey",
        parent_col="n_regionkey",
        k=5,
    )


@register(
    "x199_l_diversity",
    """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS INT)) AS BIGINT)
         AS l_div,
       count(DISTINCT CAST(floor(c_acctbal / 1000) AS INT)) >= 2 AS diverse
FROM customer GROUP BY 1, 2
""",
)
def x199_l_diversity(spark, sf_dir):
    # l-diversity of the sensitive balance band inside each
    # (nation, segment) class: a k-anonymous class whose band is
    # constant still discloses it — flag classes with < 2 distinct
    # values. One partial+final distinct-agg shuffle.
    from dirty_js_etl_spark.operators.privacy import l_diversity

    cat = _cat(spark, sf_dir)
    cust = cat.read("customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("int")
    )
    return l_diversity(
        cust, ["c_nationkey", "c_mktsegment"], "bal_band", l_floor=2
    )
