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
from dirty_js_etl_spark.queries.q04_corpus import _NORM_SQL, _STREAM_COUNTER

@register(
    "x96_equalize_mix",
    """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
m AS (SELECT min(cnt) AS m FROM c)
SELECT d.doc_id, d.lang
FROM documents d JOIN c USING (lang) CROSS JOIN m
WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      % 10000 * c.cnt < m.m * 10000
""",
)
def x96_equalize_mix(spark, sf_dir):
    # Downsample every language domain to the size of the smallest one
    # (corpus mix equalization).  Data-dependent rates: per-domain
    # counts (one small agg, broadcast back) and the global min; the
    # keep test is PURE INTEGER math -- bucket/10000 < m/cnt spelled
    # as bucket*cnt < m*10000 -- so no float rounding can disagree
    # across engines or partitions.  Like x47 the selection is keyed
    # on md5(doc_id): stable under retries, re-runs, and resharding.
    from dirty_js_etl_spark.operators.splits import hash_bucket

    docs = _cat(spark, sf_dir).read("documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    m = counts.agg(F.min("cnt").alias("m"))
    b = hash_bucket(F.col("doc_id"), 10000).cast("bigint")
    return (
        docs.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(m))
        .filter(b * F.col("cnt") < F.col("m") * 10000)
        .select("doc_id", "lang")
    )


@register(
    "x97_token_search",
    f"""
WITH tok AS (
  SELECT doc_id, UNNEST(list_distinct(string_split({_NORM_SQL}, ' '))) AS t
  FROM documents
), hits AS (
  SELECT doc_id FROM tok WHERE t IN ('data', 'merge', 'scan')
  GROUP BY doc_id HAVING count(*) = 3
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN hits USING (doc_id)
""",
)
def x97_token_search(spark, sf_dir):
    # Inverted-index AND-search: documents containing ALL query terms.
    # Explode -> filter to the 3 query tokens (pushed into the scan's
    # generator output, so the shuffle carries only matching postings)
    # -> one count aggregate with HAVING = |query|.  This is the
    # conjunctive-postings-intersection plan of a search engine,
    # expressed as groupBy; at 100 TB the posting explode is map-side
    # and the shuffle is proportional to matches, not corpus size.
    from dirty_js_etl_spark.operators.text import tokens

    terms = ["data", "merge", "scan"]
    docs = _cat(spark, sf_dir).read("documents")
    postings = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("t"),
    ).filter(F.col("t").isin(terms))
    hits = (
        postings.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == len(terms))
        .select("doc_id")
    )
    return docs.join(hits, "doc_id").select("doc_id", "lang", "n_chars")


@register(
    "x98_reaggregate_weekly",
    """
WITH daily AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week_idx,
         CAST(ts AS DATE) AS day,
         count(*) AS cnt,
         sum(CAST(value AS DECIMAL(18,6))) AS sval,
         max(value) AS mval
  FROM events GROUP BY 1, 2
)
SELECT CAST(week_idx AS INT) AS week_idx,
       CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(sum(sval) AS DOUBLE) AS total_value,
       CAST(round(CAST(sum(sval) AS DOUBLE) / sum(cnt), 6) + 0.0 AS DOUBLE)
         AS avg_value,
       max(mval) AS max_value
FROM daily GROUP BY week_idx
""",
)
def x98_reaggregate_weekly(spark, sf_dir):
    # Incremental-aggregation pattern: a DAILY partial-state rollup
    # (count, decimal sum, max -- all reaggregable) is the stored
    # artifact; the weekly answer re-aggregates the tiny daily state
    # instead of rescanning raw events.  At 100 TB/day this is how
    # dashboards stay O(days) not O(rows): sums of sums and maxes of
    # maxes are exact, and avg is derived from (sum, count) state at
    # the final level -- never averaged across levels.  The oracle
    # computes the same two-level plan from raw, proving the
    # decomposition exact (decimal state => order-independent).
    ev = _cat(spark, sf_dir).read("events")
    daily = ev.groupBy(
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            / F.lit(7)
        )
        .cast("int")
        .alias("week_idx"),
        F.col("ts").cast("date").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sval"),
        F.max("value").alias("mval"),
    )
    return daily.groupBy("week_idx").agg(
        F.sum("cnt").alias("n_events"),
        F.sum("sval").cast("double").alias("total_value"),
        (
            F.round(F.sum("sval").cast("double") / F.sum("cnt"), 6) + F.lit(0.0)
        ).alias("avg_value"),
        F.max("mval").alias("max_value"),
    )


@register(
    "x99_interarrival_stats",
    """
WITH gaps AS (
  SELECT event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
)
SELECT event_type,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       round(quantile_cont(gap, 0.5), 6) AS p50_gap,
       round(quantile_cont(gap, 0.95), 6) AS p95_gap
FROM gaps WHERE gap IS NOT NULL
GROUP BY event_type
""",
)
def x99_interarrival_stats(spark, sf_dir):
    # Inter-arrival time distribution per event type: one window pass
    # partitioned by (user, type) computes gaps (whole seconds, floor
    # on both engines), then exact percentiles per type.  The window
    # shuffle key (user_id, event_type) is finer than the aggregate
    # key (event_type) -- Spark inserts the second, small shuffle on
    # the already-reduced gap rows; at 100 TB swap percentile for the
    # KLL sketch as in x35.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ev = _cat(spark, sf_dir).read("events")
    gaps = ev.withColumn(
        "gap",
        F.unix_timestamp(F.col("ts").cast("timestamp"))
        - F.lag(F.unix_timestamp(F.col("ts").cast("timestamp"))).over(w),
    ).filter(F.col("gap").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("p50_gap"),
        F.round(F.expr("percentile(gap, 0.95)"), 6).alias("p95_gap"),
    )


@register(
    "x100_weighted_sample",
    """
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         CAST(n_chars AS DOUBLE) /
         (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) AS DOUBLE) + 1.0) AS k
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars FROM keyed ORDER BY k DESC, doc_id LIMIT 50
""",
)
def x100_weighted_sample(spark, sf_dir):
    # Weighted sample (weight = n_chars): longer documents are
    # proportionally more likely to be kept.  The Pareto-race key w/u
    # is ONE correctly-rounded IEEE division of exact integers, so the
    # DuckDB oracle reproduces the ranking bit-for-bit (the previous
    # A-Res u^(1/w) key rode non-correctly-rounded pow and was
    # rows-only); distributional properties stay pinned by
    # test_corpus.py (equal weights == hash sample, determinism under
    # repartitioning, monotone inclusion in weight).
    from dirty_js_etl_spark.operators.corpus import weighted_sample

    docs = _cat(spark, sf_dir).read("documents")
    return weighted_sample(
        docs.select("doc_id", "lang", "n_chars"), "doc_id", "n_chars", 50
    )


@register(
    "x101_union_harmonize",
    """
SELECT doc_id, 'documents' AS provenance, lang,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
UNION ALL
SELECT event_id + 1000000 AS doc_id, 'events' AS provenance,
       CAST(NULL AS VARCHAR) AS lang,
       CAST(length(props) AS BIGINT) AS n_chars
FROM events
""",
)
def x101_union_harmonize(spark, sf_dir):
    # Heterogeneous-corpus merge: two sources with DIFFERENT schemas
    # harmonized by name (missing columns become typed NULLs) plus a
    # provenance tag -- the ingest step of every multi-source training
    # corpus.  unionByName(allowMissingColumns) is a zero-shuffle
    # concatenation: each side stays in its own partitions; Spark
    # just aligns columns.  Contrast positional unionAll, which would
    # silently mis-bind columns here.
    cat = _cat(spark, sf_dir)
    docs = cat.read("documents").select(
        "doc_id",
        F.lit("documents").alias("provenance"),
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
    )
    evs = cat.read("events").select(
        (F.col("event_id") + 1000000).alias("doc_id"),
        F.lit("events").alias("provenance"),
        F.length("props").cast("bigint").alias("n_chars"),
    )
    return docs.unionByName(evs, allowMissingColumns=True)


@register(
    "x102_embedding_norms",
    """
WITH n AS (
  SELECT label,
         round(sqrt(list_sum(list_transform(embedding,
                    e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))), 6) AS nrm
  FROM embeddings
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(CAST(sum(CAST(nrm AS DECIMAL(18,9))) AS DOUBLE)
                  / count(*) + 0.0 AS DOUBLE) AS avg_norm,
       min(nrm) AS min_norm,
       max(nrm) AS max_norm
FROM n GROUP BY label
""",
)
def x102_embedding_norms(spark, sf_dir):
    # Per-label L2-norm statistics -- the sanity check before any
    # cosine ANN (unnormalized vectors break inner-product indexes).
    # The norm is a sequential array fold in DOUBLE on both engines
    # (float32 elements are widened BEFORE multiply: float*float would
    # lose bits DuckDB-side), rounded once, then averaged through
    # DECIMAL so partition order can't move the result.  Map-only +
    # one 10-key aggregate: at 100 TB this is scan-bound.
    emb = _cat(spark, sf_dir).read("embeddings")
    nrm = F.round(
        F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ),
        6,
    )
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            # the INNER per-row round stays (it makes the DECIMAL(18,9)
            # cast exact); these OUTER rounds over the already-rounded,
            # bit-identical norms were pure flake surface -- raw
            # division / min / max (kmv discipline)
            (
                F.sum(F.col("nrm").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
                + F.lit(0.0)
            ).alias("avg_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


@register(
    "x103_topk_with_ties",
    """
WITH ranked AS (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         dense_rank() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC) AS rnk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def x103_topk_with_ties(spark, sf_dir):
    # Top-3 order totals per market segment WITH ties (dense_rank, so
    # equal totals share a rank and all qualify) -- the tie-correct
    # variant of x22's TakeOrdered top-N.  customer joins without a
    # forced hint (it scales with the data; size-based planning
    # broadcasts while it fits); the window shuffles orders once on the
    # 5-value segment key.  At
    # 100 TB a 5-partition window would hotspot: pre-aggregate a
    # per-segment threshold via approx quantile first, filter, THEN
    # rank the survivors (same answer, bounded partition).
    cat = _cat(spark, sf_dir)
    from pyspark.sql import Window

    o = cat.read("orders")
    c = cat.read("customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"))
    return (
        j.withColumn("rnk", F.dense_rank().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "x104_skew_diagnostics",
    """
WITH c AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
), t AS (SELECT sum(cnt) AS total FROM c)
SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * 10000 // total AS BIGINT) AS share_bps
FROM c, t
ORDER BY cnt DESC, user_id
LIMIT 10
""",
)
def x104_skew_diagnostics(spark, sf_dir):
    # Join-key skew report: the 10 heaviest keys with their share of
    # total rows in basis points (integer math -- cnt*10000 DIV total
    # -- so both engines agree exactly).  This is the pre-flight check
    # before choosing broadcast/salt/AQE strategies on a new 100 TB
    # input: count per key (map-side combined), 1-row total broadcast,
    # TakeOrdered(10) -- no full sort.
    ev = _cat(spark, sf_dir).read("events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.agg(F.sum("cnt").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "cnt",
            F.expr("CAST(cnt * 10000 DIV total AS BIGINT)").alias("share_bps"),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(10)
    )


@register(
    "x105_dim_flatten",
    """
SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def x105_dim_flatten(spark, sf_dir):
    # Snowflake-to-star dimension flattening: resolve the FK chain
    # customer -> nation -> region into one denormalized dim (the C13
    # ForeignKey lookup generalized to multi-hop).  Both parents
    # broadcast, so the fact-side table never shuffles; run once and
    # persist, then every downstream join is a single broadcast hop.
    cat = _cat(spark, sf_dir)
    c = cat.read("customer")
    n = cat.read("nation")
    r = cat.read("region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


@register(
    "x106_asof_forward",
    """
SELECT l.event_id, l.user_id,
       nxt.nv AS next_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
LEFT JOIN LATERAL (
  SELECT r.value AS nv
  FROM events r
  WHERE r.user_id = l.user_id AND r.event_type = 'purchase'
    AND r.ts >= l.ts
  ORDER BY r.ts, r.event_id LIMIT 1
) nxt ON TRUE
""",
)
def x106_asof_forward(spark, sf_dir):
    # FORWARD as-of join: each click gains the value of the user's
    # next purchase at-or-after it -- conversion attribution without a
    # range-join explosion.  Same union + single key-shuffle + running
    # fill as the backward x21, just ordered in reverse time; DuckDB
    # has no forward ASOF so the oracle spells it as a LATERAL top-1.
    from dirty_js_etl_spark.operators.asof import asof_join

    ev = _cat(spark, sf_dir).read("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("next_purchase_value"),
        "event_id",
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="p_ts",
        payload_cols=["next_purchase_value"],
        direction="forward",
        tiebreak_cols=["event_id"],
    )
    return out.select("event_id", "user_id", "next_purchase_value")


@register(
    "x107_char_entropy",
    """
WITH chars AS (
  SELECT doc_id, substring(txt, i, 1) AS ch
  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS txt
        FROM documents) t,
       UNNEST(generate_series(1, length(txt))) AS s(i)
), freq AS (
  SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY doc_id, ch
), tot AS (
  SELECT doc_id, sum(cnt) AS total FROM freq GROUP BY doc_id
)
SELECT f.doc_id,
       round(-sum((CAST(cnt AS DOUBLE) / total)
                  * ln(CAST(cnt AS DOUBLE) / total)), 6) + 0.0 AS entropy,
       CAST(count(*) AS BIGINT) AS alphabet_size
FROM freq f JOIN tot USING (doc_id)
GROUP BY f.doc_id
""",
)
def x107_char_entropy(spark, sf_dir):
    # Character-unigram Shannon entropy per document -- a cheap,
    # language-agnostic quality/gibberish signal (near-zero = repeated
    # filler, high = noise).  Explode-to-chars is a map-side generator;
    # two hash aggregates keyed by doc_id share one shuffle.  The ~30
    # p*ln(p) terms per doc are summed in double and rounded to 6 dp
    # (the repo's transcendental-output rule).
    from dirty_js_etl_spark.operators.text import normalize_text

    docs = _cat(spark, sf_dir).read("documents")
    chars = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), "")).alias("ch"),
    ).filter(F.length("ch") > 0)
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.groupBy("doc_id").agg(F.sum("cnt").alias("total"))
    p = F.col("cnt").cast("double") / F.col("total")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            (F.round(-F.sum(p * F.log(p)), 6) + F.lit(0.0)).alias("entropy"),
            F.count(F.lit(1)).alias("alphabet_size"),
        )
    )


@register(
    "x108_version_retention",
    """
WITH v AS (
  SELECT user_id, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, value, ts AS version_ts, CAST(rn AS INT) AS recency_rank
FROM v WHERE rn <= 2
""",
)
def x108_version_retention(spark, sf_dir):
    # Snapshot retention: keep only the latest N versions per key (the
    # compaction step that bounds SCD/CDC history growth).  One
    # key-partitioned window; at 100 TB this runs per storage
    # partition during compaction, and the rank-desc form never needs
    # a global sort.
    from pyspark.sql import Window

    ev = _cat(spark, sf_dir).read("events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "user_id",
            "value",
            F.col("ts").alias("version_ts"),
            F.col("rn").cast("int").alias("recency_rank"),
        )
    )


@register(
    "x109_stream_stream_join",
    """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id, p.value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
""",
)
def x109_stream_stream_join(spark, sf_dir):
    # STREAM-STREAM interval join (clicks x purchases within 2 h),
    # both sides streamed with watermarks; must equal the batch
    # BETWEEN join once the finite source drains.  The time-bound
    # condition is what lets Spark evict per-side buffered state.
    from dirty_js_etl_spark.streaming.events import stream_stream_attribution

    name = f"click_purchase_{next(_STREAM_COUNTER)}"
    return stream_stream_attribution(spark, sf_dir, query_name=name)


@register(
    "x110_groupwise_znorm",
    """
SELECT user_id, event_id,
       CAST(round((value - avg(value) OVER w)
                  / stddev_pop(value) OVER w, 6) + 0.0 AS DOUBLE) AS z
FROM events
WINDOW w AS (PARTITION BY user_id)
""",
)
def x110_groupwise_znorm(spark, sf_dir):
    # Group-wise z-normalization through applyInPandas: each user's
    # events arrive as ONE Arrow batch and a vectorized pandas kernel
    # normalizes them -- the template for custom per-group Python
    # logic Spark expressions can't say (model scoring, per-entity
    # fits).  Cost: one shuffle on the group key + Arrow
    # (de)serialization; groups must fit in executor memory, which
    # per-user event history does at any corpus size.  The built-in
    # window spelling (= the oracle) is preferred when expressible --
    # this query exists to keep the applyInPandas path tested.
    import pandas as pd

    ev = _cat(spark, sf_dir).read("events").select("user_id", "event_id", "value")

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["value"].std(ddof=0)
        m = pdf["value"].mean()
        z = (pdf["value"] - m) / s if s > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "z": (z.round(6) + 0.0),
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        znorm, schema="user_id long, event_id long, z double"
    )


@register(
    "x111_interval_coalesce",
    """
WITH iv AS (
  SELECT user_id,
         CAST(ts AS TIMESTAMP) - INTERVAL 10 MINUTE AS s,
         CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING)
                OR max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged
), merged AS (
  SELECT user_id, island_id, min(s) AS ms, max(e) AS me
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(date_diff('second', ms, me)) AS BIGINT) AS covered_seconds
FROM merged GROUP BY user_id
""",
)
def x111_interval_coalesce(spark, sf_dir):
    # Interval coalescing (union of overlapping intervals): each event
    # projects a +/-10-minute influence interval; overlapping ones
    # merge into islands (running-max-end sweep), and the answer is
    # per-user island count + total covered seconds -- EXACT integer
    # seconds, no float anywhere.  Generalizes gap-sessionization to
    # arbitrary, overlapping intervals with one user-keyed shuffle
    # shared by both window passes and both aggregates.
    from pyspark.sql import Window

    ev = _cat(spark, sf_dir).read("events")
    iv = ev.select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_e = F.max("e").over(w_prev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    ).withColumn("island_id", F.sum("new_island").over(w_run))
    merged = flagged.groupBy("user_id", "island_id").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(
            F.unix_timestamp(F.col("me").cast("timestamp"))
            - F.unix_timestamp(F.col("ms").cast("timestamp"))
        ).alias("covered_seconds"),
    )


@register(
    "x112_udtf_chunk",
    f"""
WITH tok AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
)
SELECT doc_id, CAST(i - 1 AS INT) AS chunk_id,
       array_to_string(toks[(i - 1) * 30 + 1 : (i - 1) * 30 + 30], ' ')
         AS chunk_text,
       CAST(least(30, len(toks) - (i - 1) * 30) AS INT) AS n_tokens
FROM tok, UNNEST(generate_series(1, (len(toks) + 29) // 30)) AS s(i)
""",
)
def x112_udtf_chunk(spark, sf_dir):
    # Python UDTF (Spark 4 table function): one doc row in, N chunk
    # rows out, consumed via LATERAL join -- the API for custom
    # row-GENERATING logic (parsers, tokenizers, samplers) that scalar
    # UDFs can't express.  useArrow=True plans ArrowEvalPythonUDTF
    # (Arrow-batched exchange with the Python worker) instead of
    # row-pickling BatchEvalPython — caught by the registry-wide plan
    # lint (test_plans.py). The preferred scale implementation of this
    # exact transform is still x85's explode/codegen; this keeps the
    # UDTF surface tested on its fast path.
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_id int, chunk_text string, n_tokens int",
        useArrow=True,
    )
    class Chunker:
        def eval(self, text: str):
            toks = " ".join((text or "").lower().strip().split()).split(" ")
            size = 30
            for ci in range((len(toks) + size - 1) // size):
                piece = toks[ci * size : (ci + 1) * size]
                yield ci, " ".join(piece), len(piece)

    spark.udtf.register("chunk_doc", Chunker)
    docs = _cat(spark, sf_dir).read("documents")
    docs.createOrReplaceTempView("__x112_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_tokens
        FROM __x112_docs d, LATERAL chunk_doc(d.text) c
        """
    )


@register(
    "x113_variant_json",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS DOUBLE)
                  / count(*) + 0.0 AS DOUBLE) AS avg_k
FROM events GROUP BY event_type
""",
)
def x113_variant_json(spark, sf_dir):
    # Semi-structured path via the VARIANT type (Spark 4): parse_json
    # once into a binary variant, then typed variant_get extraction --
    # unlike get_json_object (x11) the parse cost is paid once per row
    # regardless of how many fields are later plucked, and the variant
    # column can be stored/shuffled in its compact binary form.
    # Integer payloads keep the aggregate exact.
    ev = _cat(spark, sf_dir).read("events")
    v = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        # raw integer-sum / count -- bit-identical on both engines,
        # no decimal re-round (kmv discipline)
        (
            F.sum("k").cast("double") / F.count(F.lit(1)) + F.lit(0.0)
        ).alias("avg_k"),
    )


@register(
    "x114_date_spine_zero_fill",
    """
WITH spine AS (
  SELECT CAST(UNNEST(generate_series(DATE '1995-01-01', DATE '1995-06-30',
                                     INTERVAL 1 DAY)) AS DATE) AS day
), o AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate <= DATE '1995-06-30'
  GROUP BY 1
)
SELECT strftime(spine.day, '%Y-%m-%d') AS day,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
FROM spine LEFT JOIN o ON spine.day = o.day
""",
)
def x114_date_spine_zero_fill(spark, sf_dir):
    # Zero-filled daily order counts over a CUSTOM PYTHON DATA SOURCE
    # date spine (sources/pyds.py): absent days surface as explicit
    # zeros -- the calendar-join primitive dashboards and
    # interpolation need.  The spine generates partition-parallel on
    # executors (never materialized on the driver) and both join
    # inputs are tiny after the pre-agg, so the join broadcasts.
    from dirty_js_etl_spark.sources.pyds import register_date_spine

    register_date_spine(spark)
    spine = (
        spark.read.format("date_spine")
        .option("start", "1995-01-01")
        .option("end", "1995-06-30")
        .option("partitions", "4")
        .load()
    )
    o = (
        _cat(spark, sf_dir)
        .read("orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") <= F.lit("1995-06-30").cast("date"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(F.broadcast(o), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
        )
    )


@register(
    "x115_tpch_q13",
    """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def x115_tpch_q13(spark, sf_dir):
    # TPC-H Q13 analog (customer order-count distribution): the LEFT
    # join keeps order-less customers so the zero bucket is real.
    # count(o_orderkey) (not count(*)) makes unmatched rows count 0.
    # Two aggregations: the first shuffles on c_custkey, the second is
    # a tiny distribution reduce -- the canonical "histogram of a
    # group-by" double aggregate.
    cat = _cat(spark, sf_dir)
    c = cat.read("customer")
    o = cat.read("orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "x116_tpch_q17",
    f"""
WITH pavg AS (
  SELECT l_partkey, 0.2 * (sum(l_quantity) / count(*)) AS qty_thresh
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  / 7.0 + 0.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
JOIN pavg ON pavg.l_partkey = l.l_partkey
WHERE l.l_quantity < pavg.qty_thresh
""",
)
def x116_tpch_q17(spark, sf_dir):
    # TPC-H Q17 analog (small-quantity-order revenue): the correlated
    # "avg quantity for this part" subquery decorrelates into a
    # per-part aggregate joined back to lineitem.  Quantities are
    # integral doubles so sum/count (and the 0.2x threshold) are
    # bit-identical across engines; money goes through DECIMAL.  No
    # forced hints: part and the per-part averages both scale with the
    # data, so size-based planning / AQE picks broadcast only while
    # they fit.  lineitem is scanned twice (avg pass + probe pass).
    cat = _cat(spark, sf_dir)
    li = cat.read("lineitem")
    p = cat.read("part").filter(F.col("p_brand") == "Brand#12")
    pavg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count(F.lit(1)))).alias(
            "qty_thresh"
        )
    )
    probe = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pavg.withColumnRenamed("l_partkey", "pk"),
              F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
    )
    return probe.agg(
        # raw division of an exact decimal sum -- bit-identical on both
        # engines, no decimal re-round (kmv discipline)
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / 7.0
            + F.lit(0.0)
        ).alias("avg_yearly")
    )


@register(
    "x117_tpch_q15",
    f"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum({_DEC}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)
def x117_tpch_q15(spark, sf_dir):
    # TPC-H Q15 analog (top supplier by quarterly revenue): the view
    # becomes a cached-reusable aggregate, the scalar max is a 1-row
    # broadcast, and the equality keeps ALL tied winners (exact
    # decimal revenue makes the tie test sound; a double sum could
    # split ties across partitions_orders).  Supplier dim broadcasts.
    cat = _cat(spark, sf_dir)
    li = cat.read("lineitem")
    s = cat.read("supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "x118_tpch_q7",
    f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(sum({_DEC.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY sn.n_name, cn.n_name, l_year
""",
)
def x118_tpch_q7(spark, sf_dir):
    # TPC-H Q7 analog (volume shipping between two nations): a 6-table
    # join where every dimension (supplier, customer, both nation
    # copies) broadcasts, so the only fact-scale shuffle is
    # lineitem |x| orders on orderkey; the disjunctive nation-pair
    # predicate prunes AFTER the cheap broadcast lookups.  Decimal
    # revenue, grouped by direction x ship year.
    cat = _cat(spark, sf_dir)
    li = cat.read("lineitem")
    o = cat.read("orders")
    c = cat.read("customer")
    s = cat.read("supplier")
    n = cat.read("nation")
    cn = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        # customer/supplier scale with the data — no forced hints; the
        # 25-row nation projections keep theirs
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


_Z_DUCK = "(((l_partkey % 256) // 1) % 2) * 1 + (((l_suppkey % 256) // 1) % 2) * 2 + (((l_partkey % 256) // 2) % 2) * 4 + (((l_suppkey % 256) // 2) % 2) * 8 + (((l_partkey % 256) // 4) % 2) * 16 + (((l_suppkey % 256) // 4) % 2) * 32 + (((l_partkey % 256) // 8) % 2) * 64 + (((l_suppkey % 256) // 8) % 2) * 128 + (((l_partkey % 256) // 16) % 2) * 256 + (((l_suppkey % 256) // 16) % 2) * 512 + (((l_partkey % 256) // 32) % 2) * 1024 + (((l_suppkey % 256) // 32) % 2) * 2048 + (((l_partkey % 256) // 64) % 2) * 4096 + (((l_suppkey % 256) // 64) % 2) * 8192 + (((l_partkey % 256) // 128) % 2) * 16384 + (((l_suppkey % 256) // 128) % 2) * 32768"
_Z_SPARK = "(((l_partkey % 256) DIV 1) % 2) * 1 + (((l_suppkey % 256) DIV 1) % 2) * 2 + (((l_partkey % 256) DIV 2) % 2) * 4 + (((l_suppkey % 256) DIV 2) % 2) * 8 + (((l_partkey % 256) DIV 4) % 2) * 16 + (((l_suppkey % 256) DIV 4) % 2) * 32 + (((l_partkey % 256) DIV 8) % 2) * 64 + (((l_suppkey % 256) DIV 8) % 2) * 128 + (((l_partkey % 256) DIV 16) % 2) * 256 + (((l_suppkey % 256) DIV 16) % 2) * 512 + (((l_partkey % 256) DIV 32) % 2) * 1024 + (((l_suppkey % 256) DIV 32) % 2) * 2048 + (((l_partkey % 256) DIV 64) % 2) * 4096 + (((l_suppkey % 256) DIV 64) % 2) * 8192 + (((l_partkey % 256) DIV 128) % 2) * 16384 + (((l_suppkey % 256) DIV 128) % 2) * 32768"


@register(
    "x119_zorder_layout",
    f"""
WITH z AS (
  SELECT CAST(({_Z_DUCK}) AS BIGINT) AS zkey FROM lineitem
)
SELECT CAST(zkey // 256 AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(zkey) AS BIGINT) AS z_min,
       CAST(max(zkey) AS BIGINT) AS z_max
FROM z GROUP BY 1
""",
)
def x119_zorder_layout(spark, sf_dir):
    # Z-order (Morton) clustering key: interleave the low 8 bits of
    # partkey and suppkey so rows close in BOTH dimensions land close
    # in ONE sort order -- the layout that lets min/max file stats
    # prune 2-D predicates (the OPTIMIZE ZORDER primitive, as pure
    # integer arithmetic, identical in any engine).  The real write
    # path is repartitionByRange(z_bucket).sortWithinPartitions(zkey);
    # this query validates the key math via the per-bucket histogram
    # that would become the file layout.
    li = _cat(spark, sf_dir).read("lineitem")
    z = li.select(F.expr(_Z_SPARK).cast("bigint").alias("zkey"))
    return z.groupBy(
        F.expr("zkey DIV 256").cast("bigint").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("zkey").cast("bigint").alias("z_min"),
        F.max("zkey").cast("bigint").alias("z_max"),
    )


@register(
    "x120_shard_assignment",
    f"""
WITH d AS (
  SELECT doc_id, length(string_split({_NORM_SQL}, ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS before_t,
         (SELECT sum(n_tokens) FROM d) AS total_t
  FROM d
)
SELECT CAST(least(before_t * 8 // total_t, 7) AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY 1
""",
)
def x120_shard_assignment(spark, sf_dir):
    # Token-balanced shard assignment: docs stream in deterministic
    # doc_id order and each is routed to shard floor(tokens_before /
    # (total/8)) -- every shard gets ~total/8 tokens regardless of doc
    # length skew (integer math throughout: before*8 DIV total).  This
    # is how a pretraining corpus is cut into equal-work shards.  The
    # running sum is a distributed prefix sum (operators/ranking.py):
    # docs range-partition on doc_id, each partition sweeps locally and
    # adds its broadcast carry offset -- exactly the "per-range token
    # offsets" plan, so no global sort at any scale.
    from dirty_js_etl_spark.operators.ranking import with_global_prefix_sum
    from dirty_js_etl_spark.operators.text import token_count

    docs = _cat(spark, sf_dir).read("documents")
    d = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    total = d.agg(F.sum("n_tokens").alias("total_t"))
    c = (
        with_global_prefix_sum(d, ["doc_id"], "n_tokens", "__cum")
        .withColumn("before_t", F.col("__cum") - F.col("n_tokens"))
        .crossJoin(F.broadcast(total))
    )
    return (
        c.select(
            F.least(
                F.expr("before_t * 8 DIV total_t"), F.lit(7)
            ).cast("int").alias("shard"),
            "n_tokens",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@register(
    "x121_jsonl_export",
    """
SELECT doc_id,
       to_json(struct_pack(doc_id := doc_id, lang := lang,
                           n_chars := n_chars)) AS jsonl
FROM documents
""",
)
def x121_jsonl_export(spark, sf_dir):
    # JSONL corpus export: each row rendered as one compact JSON
    # object (the interchange format of every LLM data pipeline).
    # to_json(struct(...)) is JVM codegen -- byte-identical rendering
    # to DuckDB's struct_pack for integer/string fields -- and the
    # write path is just .write.text() on this column: map-only,
    # no shuffle, trivially parallel.
    docs = _cat(spark, sf_dir).read("documents")
    return docs.select(
        "doc_id",
        F.to_json(
            F.struct(
                F.col("doc_id"), F.col("lang"), F.col("n_chars")
            )
        ).alias("jsonl"),
    )


@register(
    "x122_try_cast_audit",
    """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(TRY_CAST(substring(source, 4) AS INT)) AS BIGINT)
         AS n_numeric_suffix,
       CAST(count(*) - count(TRY_CAST(lang AS INT)) AS BIGINT)
         AS n_lang_nonnum
FROM documents GROUP BY source
""",
)
def x122_try_cast_audit(spark, sf_dir):
    # Safe-casting data-quality audit: try_cast turns malformed values
    # into NULLs instead of failing the job (this session runs ANSI
    # mode, where a plain CAST on bad input ABORTS the query -- at
    # 100 TB one bad row must not kill a 6-hour job).  count(expr)
    # counts non-NULLs, so each aggregate is a per-column parse
    # success/failure tally in one pass.
    docs = _cat(spark, sf_dir).read("documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.expr("substring(source, 4)").try_cast("int")).alias(
            "n_numeric_suffix"
        ),
        (
            F.count(F.lit(1)) - F.count(F.col("lang").try_cast("int"))
        ).alias("n_lang_nonnum"),
    )


@register(
    "x123_extract_numbers",
    """
WITH m AS (
  SELECT doc_id, regexp_extract_all(text, '[0-9]{1,15}') AS nums
  FROM documents
)
SELECT doc_id,
       CAST(len(nums) AS INT) AS n_numbers,
       CAST(coalesce(list_max(list_transform(nums,
              x -> CAST(x AS BIGINT))), -1) AS BIGINT) AS max_number
FROM m
""",
)
def x123_extract_numbers(spark, sf_dir):
    # Structured extraction: pull every digit run (capped at 15 digits
    # so BIGINT can't overflow under ANSI mode) and reduce per doc --
    # the regexp_extract_all -> transform -> array_max chain is all
    # JVM codegen, no UDF, map-only.  RE2-compatible pattern so
    # external engines tokenize identically (same contract as the PII
    # redactor).
    docs = _cat(spark, sf_dir).read("documents")
    nums = F.regexp_extract_all(F.col("text"), F.lit("[0-9]{1,15}"), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(nums).cast("int").alias("n_numbers"),
        F.coalesce(
            F.array_max(F.transform(nums, lambda x: x.cast("bigint"))),
            F.lit(-1),
        ).cast("bigint").alias("max_number"),
    )


@register(
    "x124_typed_set_agg",
    """
SELECT user_id,
       array_to_string(list_sort(list_distinct(list(event_type))), ',')
         AS event_types,
       CAST(count(DISTINCT event_type) AS INT) AS n_types
FROM events GROUP BY user_id
""",
)
def x124_typed_set_agg(spark, sf_dir):
    # Set-valued aggregation rendered deterministically: collect_set
    # gathers per-key distinct values in ARBITRARY order (partition
    # and scheduling dependent), so the contract for stable output is
    # sort-then-join -- the same discipline any array-producing
    # aggregate needs before hashing, diffing, or exporting.
    ev = _cat(spark, sf_dir).read("events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), ","
        ).alias("event_types"),
        F.countDistinct("event_type").cast("int").alias("n_types"),
    )


@register(
    "x125_surrogate_keys",
    """
WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_custkey < 100
), mx AS (
  SELECT max(c_custkey) AS max_key FROM dim
), new_members AS (
  SELECT DISTINCT o_custkey
  FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM dim)
)
SELECT o_custkey AS natural_key,
       max_key + row_number() OVER (ORDER BY o_custkey) AS surrogate_key
FROM new_members, mx
""",
)
def x125_surrogate_keys(spark, sf_dir):
    # Warehouse surrogate-key assignment: natural keys arriving in the
    # fact load but missing from the (stale, custkey<100) dimension get
    # dense new ids continuing from the dimension's current max.  Never monotonically_increasing_id
    # (partition-dependent, non-dense): deterministic order + the
    # distributed row number (operators/ranking.py) + broadcast max --
    # dense, reproducible ids with no single-partition sort even when
    # a backfill makes the "delta" dimension-sized.
    from dirty_js_etl_spark.operators.ranking import with_global_row_number

    cat = _cat(spark, sf_dir)
    c = cat.read("customer").filter(F.col("c_custkey") < 100)
    o = cat.read("orders")
    new_members = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .select("o_custkey")
        .distinct()
    )
    mx = c.agg(F.max("c_custkey").alias("max_key"))
    return (
        with_global_row_number(new_members, ["o_custkey"], "__rn")
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("o_custkey").alias("natural_key"),
            (F.col("max_key") + F.col("__rn")).alias("surrogate_key"),
        )
    )


