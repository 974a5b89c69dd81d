"""Entity-resolution queries (``operators/linkage.py``).

Record linkage over the part catalog: records are the composite
``p_name|p_type`` listing strings, the blocking key is the product
noun + brand (cheap, high-recall — two listings of the same product
share both), matches are within-block pairs at Levenshtein ≤ 2, and
entities are connected components over the match graph. Both stages
are exactly SQL-replayable (DuckDB ships ``levenshtein`` and walks
the components with the x36 recursive-CTE pattern), so blocked
candidate generation, the in-join distance pruning, AND the
transitive entity assignment are all hash-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.queries._shared import _cat, register

_LINK_CTE = """
WITH RECURSIVE c AS (
  SELECT p_partkey, p_name || '|' || p_type AS rec,
         split_part(p_name, ' ', 2) || '|' || p_brand AS blk
  FROM part
), sized AS (
  SELECT c.* FROM c JOIN (
    SELECT blk, count(*) AS n FROM c GROUP BY blk HAVING count(*) <= 10000
  ) s USING (blk)
), pairs AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
         CAST(levenshtein(a.rec, b.rec) AS INT) AS distance
  FROM sized a JOIN sized b
    ON a.blk = b.blk AND a.p_partkey < b.p_partkey
   AND levenshtein(a.rec, b.rec) <= 2
)"""


@register(
    "x205_link_pairs",
    _LINK_CTE + "\nSELECT id_a, id_b, distance FROM pairs",
)
def x205_link_pairs(spark, sf_dir):
    # blocked candidate generation + in-join Levenshtein pruning: one
    # block-keyed shuffle, candidate work bounded by block sizes (the
    # hot-block cap guards the quadratic), distance evaluated inside
    # the join condition by the codegen'd JVM levenshtein.
    from dirty_js_etl_spark.operators.linkage import blocked_link_pairs

    part = _cat(spark, sf_dir).read("part")
    return blocked_link_pairs(
        part,
        "p_partkey",
        F.concat_ws("|", "p_name", "p_type"),
        F.concat_ws(
            "|", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)), F.col("p_brand")
        ),
        max_distance=2,
    )


@register(
    "x207_sorted_neighborhood",
    """
WITH c AS (
  SELECT p_partkey, p_name || '|' || p_type AS rec, p_brand AS blk
  FROM part
), ranked AS (
  SELECT p_partkey, rec, blk,
         row_number() OVER (PARTITION BY blk ORDER BY rec, p_partkey) AS rn
  FROM c
)
SELECT least(a.p_partkey, b.p_partkey) AS id_a,
       greatest(a.p_partkey, b.p_partkey) AS id_b,
       CAST(levenshtein(a.rec, b.rec) AS INT) AS distance
FROM ranked a JOIN ranked b
  ON a.blk = b.blk AND b.rn - a.rn > 0 AND b.rn - a.rn < 4
 AND levenshtein(a.rec, b.rec) <= 2
""",
)
def x207_sorted_neighborhood(spark, sf_dir):
    # the OTHER classic candidate generator: within each (coarser)
    # brand block, records sort by their own value and pair with the
    # next 3 in sort order — linear in the corpus (<= w-1 rows per
    # record), so it works even on blocks too hot to pair
    # exhaustively. The rank window partitions by block, never
    # globally.
    from dirty_js_etl_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    part = _cat(spark, sf_dir).read("part")
    return sorted_neighborhood_pairs(
        part,
        "p_partkey",
        F.concat_ws("|", "p_name", "p_type"),
        F.col("p_brand"),
        window=4,
        max_distance=2,
    )


@register(
    "x206_entity_resolution",
    _LINK_CTE
    + """,
nodes AS (
  SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), walk(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id
  WHERE w.label < e.src
), clusters AS (
  SELECT id, min(label) AS entity_id FROM walk GROUP BY id
)
SELECT p.p_partkey AS id, COALESCE(cl.entity_id, p.p_partkey) AS entity_id
FROM part p LEFT JOIN clusters cl ON cl.id = p.p_partkey
""",
)
def x206_entity_resolution(spark, sf_dir):
    # full resolution: components over the match graph (min-label
    # pointer jumping — dup_clusters), singletons keep their own id.
    # The components run on the PAIR graph only; the full catalog
    # re-attaches through one left join.
    from dirty_js_etl_spark.operators.linkage import resolve_entities

    part = _cat(spark, sf_dir).read("part")
    return resolve_entities(
        part,
        "p_partkey",
        F.concat_ws("|", "p_name", "p_type"),
        F.concat_ws(
            "|", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)), F.col("p_brand")
        ),
        max_distance=2,
    )


def _x208_oracle_sql(
    shingle_k: int = 3,
    num_perm: int = 32,
    bands: int = 16,
    cap: int = 1000,
    seed: int = 42,
    max_distance: int = 2,
) -> str:
    """DuckDB replay of the FULL LSH linkage pass (the x6b idiom over
    part records): portable 60-bit md5 shingle hashes of the
    ``p_name|p_type`` record, the seeded (a*h+b) mod P signature
    family, md5-derived band buckets, the hot-bucket cap, the
    band-bucket candidate join, and the Levenshtein verify — so the
    typo-tolerant third linkage pass is hash-checked end to end."""
    from dirty_js_etl_spark.operators.dedup import _P, _hash_params

    rows = num_perm // bands
    params = _hash_params(num_perm, seed)
    mins = ",\n         ".join(
        f"min(({a} * hp + {b}) % {_P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_sel = "\n  UNION ALL ".join(
        f"SELECT id, {j} AS band, CAST('0x' || substring(md5("
        f"concat_ws('_', {', '.join(f'm{j * rows + i}' for i in range(rows))}"
        f")), 1, 15) AS BIGINT) AS bucket FROM sigs"
        for j in range(bands)
    )
    return f"""
WITH recs AS (
  SELECT min(p_partkey) AS id, rec FROM (
    SELECT p_partkey, p_name || '|' || p_type AS rec FROM part
  ) GROUP BY rec
), norm AS (
  SELECT id, regexp_replace(lower(trim(rec)), '\\s+', ' ', 'g') AS t
  FROM recs
), shingles AS (
  SELECT id, UNNEST(list_distinct(list_transform(
           range(1, greatest(length(t) - {shingle_k} + 1, 1) + 1),
           i -> substring(t, CAST(i AS INT), {shingle_k})))) AS g
  FROM norm
), hashed AS (
  SELECT id, CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % {_P} AS hp
  FROM shingles
), sigs AS (
  SELECT id,
         {mins}
  FROM hashed GROUP BY id
), banded AS (
  {band_sel}
), ok AS (
  SELECT band, bucket FROM banded GROUP BY 1, 2 HAVING count(*) <= {cap}
), kept AS (
  SELECT b.* FROM banded b JOIN ok USING (band, bucket)
), cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)
SELECT c.id_a, c.id_b,
       CAST(levenshtein(ra.rec, rb.rec) AS INT) AS distance
FROM cands c
JOIN recs ra ON ra.id = c.id_a
JOIN recs rb ON rb.id = c.id_b
WHERE levenshtein(ra.rec, rb.rec) <= {max_distance}
"""


@register("x208_lsh_link_pairs", _x208_oracle_sql())
def x208_lsh_link_pairs(spark, sf_dir):
    # typo-tolerant third linkage pass: MinHash-LSH blocks over the
    # WHOLE record string, so a typo in the x205 blocking token itself
    # (which escapes both the exact-key block and x207's brand-block
    # sort adjacency when it hits the sort prefix) still lands the pair
    # in a shared band bucket; Levenshtein verifies. Identical record
    # VALUES collapse to a min-id representative first (dedup-then-
    # link: on the 10x-replica sf1 fixture the record-level spelling is
    # a 52.9M-pair clique blowup; value-level is ~0.4M). Portable
    # hashes + md5 band buckets make every stage oracle-recomputable.
    from dirty_js_etl_spark.operators.dedup import portable_token_hash60
    from dirty_js_etl_spark.operators.linkage import lsh_link_pairs

    part = _cat(spark, sf_dir).read("part")
    return lsh_link_pairs(
        part,
        "p_partkey",
        F.concat_ws("|", "p_name", "p_type"),
        max_distance=2,
        hash_fn=portable_token_hash60,
        portable_bands=True,
    )
