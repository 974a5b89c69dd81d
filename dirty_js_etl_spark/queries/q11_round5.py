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
# Round 5: exact-substring duplication coverage, deterministic training
# shuffle, n-gram novelty profiling
# ---------------------------------------------------------------------------


@register(
    "x188_repeated_spans",
    """
WITH g AS (
  SELECT d.doc_id, s.off,
         least(40, length(d.text) - s.off + 1) AS glen,
         hash(substr(d.text, s.off, 40)) AS h
  FROM documents d,
       LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 40 + 1, 1) + 1, 10)) AS off) s
), rep AS (
  SELECT doc_id, off, glen FROM g
  WHERE h IN (SELECT h FROM g GROUP BY h HAVING count(*) >= 2)
), isl AS (
  SELECT doc_id, off, glen,
         max(off + glen) OVER (PARTITION BY doc_id ORDER BY off
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM rep
), cov AS (
  SELECT doc_id,
         sum(greatest(0, off + glen - greatest(off, coalesce(prev_end, 0))))
           AS repeated_chars
  FROM isl GROUP BY doc_id
)
SELECT d.doc_id AS id,
       CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(coalesce(c.repeated_chars, 0) AS BIGINT) AS repeated_chars,
       CAST(coalesce(c.repeated_chars, 0) AS DOUBLE) / length(d.text)
         AS repeated_ratio
FROM documents d LEFT JOIN cov c USING (doc_id)
""",
)
def x188_repeated_spans(spark, sf_dir):
    # exact-substring duplication coverage (Lee et al. 2022 ExactSubstr
    # signal) via strided 40-char fingerprints + per-doc interval union.
    # Each engine hashes the window text with its own 64-bit hash
    # (xxhash64 / DuckDB hash) — only same-engine equality matters, so
    # the coverage numbers agree. Map-only fingerprint explode, one
    # fingerprint-keyed agg, one doc-keyed window (see
    # corpus.repeated_span_coverage for the 100 TB profile).
    from dirty_js_etl_spark.operators.corpus import repeated_span_coverage

    docs = _cat(spark, sf_dir).read("documents")
    return repeated_span_coverage(docs, "doc_id", "text")


@register(
    "x189_training_shuffle",
    """
WITH h AS (
  SELECT doc_id AS id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15))
              AS BIGINT) AS hkey
  FROM documents
)
SELECT id, CAST(hkey % 8 AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY hkey % 8 ORDER BY hkey, id) - 1
            AS BIGINT) AS pos
FROM h
""",
)
def x189_training_shuffle(spark, sf_dir):
    # deterministic epoch shuffle: content-hash shard + per-shard
    # position (same seed -> identical order on any partitioning; new
    # seed -> independent permutation). ONE shuffle keyed by the
    # uniform shard, per-shard ordering window — no global sort. The
    # md5-hex-prefix -> BIGINT key is engine-portable (15 hex chars
    # < 2^60; Spark conv == DuckDB '0x' cast, probed exactly).
    from dirty_js_etl_spark.operators.corpus import training_shuffle

    docs = _cat(spark, sf_dir).read("documents")
    return training_shuffle(docs, "doc_id", n_shards=8, seed=7)


@register(
    "x190_ngram_novelty",
    r"""
WITH norm AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) <= 3 THEN array_to_string(w, ' ')
              ELSE array_to_string(w[i : i + 2], ' ') END AS g
  FROM norm,
       LATERAL (SELECT unnest(range(1, greatest(len(w) - 3 + 1, 1) + 1)) AS i) s
), first AS (
  SELECT g, min(doc_id) AS first_id FROM grams GROUP BY g
)
SELECT grams.doc_id AS id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN first_id = grams.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS novel_grams,
       CAST(sum(CASE WHEN first_id = grams.doc_id THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) AS novelty_ratio
FROM grams JOIN first USING (g)
GROUP BY grams.doc_id
""",
)
def x190_ngram_novelty(spark, sf_dir):
    # corpus-freshness profile: per doc, the share of its distinct word
    # 3-grams first seen (min doc_id) in that doc — the diminishing-
    # returns diagnostic for whether more of a source still adds new
    # text. Map-only gram explode, one gram-keyed agg, one id-keyed agg.
    from dirty_js_etl_spark.operators.corpus import ngram_novelty

    docs = _cat(spark, sf_dir).read("documents")
    return ngram_novelty(docs, "doc_id", "text", n=3)
