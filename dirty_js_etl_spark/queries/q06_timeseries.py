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
from dirty_js_etl_spark.queries.q04_corpus import _STREAM_COUNTER

# ---------------------------------------------------------------------------
# Scalar subquery, array analytics, time-series fill, streaming dedup,
# end-to-end corpus curation
# ---------------------------------------------------------------------------


@register(
    "x56_scalar_subquery",
    """
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST((SELECT avg(o_totalprice) FROM orders) AS DOUBLE) AS global_avg
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
""",
)
def x56_scalar_subquery(spark, sf_dir):
    # scalar-subquery shape: the global aggregate is a 1-row frame
    # broadcast into the scan filter -- no shuffle of the fact table
    o = _cat(spark, sf_dir).read("orders")
    avg_df = o.agg(F.avg("o_totalprice").alias("global_avg"))
    return (
        o.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > 1.5 * F.col("global_avg"))
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("global_avg").cast("double").alias("global_avg"),
        )
    )


@register(
    "x57_label_centroids",
    """
SELECT label, i - 1 AS pos,
       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
GROUP BY label, i - 1
""",
)
def x57_label_centroids(spark, sf_dir):
    # per-label centroid in long form (label, pos, centroid): posexplode
    # + hash-agg keyed by (label, pos) -- uniform keys, one shuffle; the
    # long form is what a k-means/IVF trainer consumes
    emb = _cat(spark, sf_dir).read("embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select("label", "pos", "centroid", "n_vecs")
    )


_X58_SQL = """
WITH ranked AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), hourly AS (
  SELECT user_id, hour, value AS hour_value FROM ranked WHERE rn = 1
), bounds AS (
  SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY user_id
), grid AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT g.user_id, g.hour,
       last_value(h.hour_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.hour) AS filled_value
FROM grid g LEFT JOIN hourly h
  ON g.user_id = h.user_id AND g.hour = h.hour
"""


@register("x58_hourly_grid_fill", _X58_SQL)
def x58_hourly_grid_fill(spark, sf_dir):
    from dirty_js_etl_spark.operators.timeseries import hourly_grid_fill

    events = _cat(spark, sf_dir).read("events")
    return hourly_grid_fill(events)


@register(
    "x59_streaming_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def x59_streaming_dedup(spark, sf_dir):
    # first-arrival-wins key dedup over the stream; converges to the
    # batch SELECT DISTINCT when the finite source drains
    from dirty_js_etl_spark.streaming.dedup import run_stream_dedup

    name = f"events_dedup_{next(_STREAM_COUNTER)}"
    return run_stream_dedup(
        spark, sf_dir, ["user_id", "event_type"], query_name=name
    )


_X60_SQL = f"""
WITH feat AS (
  SELECT doc_id, lang, source,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         CAST(length(string_split(regexp_replace(lower(trim(text)),
             '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
           / CAST(greatest(length(text), 1) AS DOUBLE) AS alpha_ratio
  FROM documents
), quality AS (
  SELECT * FROM feat WHERE n_tokens >= 30 AND alpha_ratio > 0.5
), dedup AS (
  SELECT min(doc_id) AS doc_id, min(lang) AS lang, min(source) AS source,
         min(n_tokens) AS n_tokens
  FROM quality GROUP BY md5(norm)
), sampled AS (
  SELECT * FROM dedup
  WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 100 < CASE lang WHEN 'en' THEN 100 ELSE 50 END
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM sampled GROUP BY lang, source
"""


@register("x60_curate_corpus", _X60_SQL)
def x60_curate_corpus(spark, sf_dir):
    """End-to-end curation: quality filter -> exact dedup (keep lowest
    doc_id) -> hash-stratified sample (100% en / 50% rest) -> per
    (lang, source) doc+token counts. The composition is the point: each
    stage is one of the engine's operators chained on one DataFrame."""
    from dirty_js_etl_spark.operators.corpus import stratified_sample
    from dirty_js_etl_spark.operators.text import (
        normalize_text,
        token_count,
    )

    docs = _cat(spark, sf_dir).read("documents")
    feat = docs.select(
        "doc_id",
        "lang",
        "source",
        normalize_text(F.col("text")).alias("norm"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        (
            F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ).alias("alpha_ratio"),
    )
    quality = feat.filter(
        (F.col("n_tokens") >= 30) & (F.col("alpha_ratio") > 0.5)
    )
    dedup = quality.groupBy(F.md5("norm")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    sampled = stratified_sample(
        dedup, "doc_id", "lang", {"en": 1.0}, default_rate=0.5
    )
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


