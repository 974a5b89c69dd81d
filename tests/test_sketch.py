"""Bloom filter, count-min sketch, and SemDeDup invariants.

Bloom and CMS carry mathematical one-sided-error contracts (never a
false negative; never an under-estimate) that hold for EVERY input, so
the tests assert them exactly rather than within tolerances. The CMS
additionally must agree bit-for-bit with its portable md5 bucket
spelling (that is what makes x149 oracle-hash-checkable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.sketch import (
    bloom_build,
    bloom_contains,
    cms_estimate,
    cms_sketch,
)
from dirty_js_etl_spark.operators.similarity import semantic_dedup
from dirty_js_etl_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    members = spark.range(0, 400).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bloom = bloom_build(members, F.col("k"), m_bits=1 << 14, k=5)
    missed = (
        members.crossJoin(F.broadcast(bloom))
        .filter(~bloom_contains(F.col("k"), F.col("bloom_words"), 1 << 14, 5))
        .count()
    )
    assert missed == 0  # every inserted key tests positive, always


def test_bloom_false_positive_rate_bounded(spark):
    members = spark.range(0, 400).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bloom = bloom_build(members, F.col("k"), m_bits=1 << 14, k=5)
    probes = spark.range(10_000, 30_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    fp = (
        probes.crossJoin(F.broadcast(bloom))
        .filter(bloom_contains(F.col("k"), F.col("bloom_words"), 1 << 14, 5))
        .count()
    )
    # (1 - e^{-kn/m})^k with n=400, m=16384, k=5 -> ~2e-5; give 50x slack
    assert fp / 20_000 < 1e-3


def test_bloom_word_array_shape(spark):
    members = spark.range(0, 10).select(F.col("id").cast("string").alias("k"))
    row = bloom_build(members, F.col("k"), m_bits=1 << 10, k=3).first()
    assert len(row["bloom_words"]) == (1 << 10) // 64


def test_bloom_query_vs_exact_anti_join(spark):
    """x147 keeps a subset of the exact anti-join's survivors (bloom can
    only over-drop via FPs, never under-drop) and drops every true
    member; with the query's m/k/n the expected FP count is ~0."""
    qs = all_queries()
    bloom_kept = {
        r["doc_id"] for r in qs["x147_bloom_decontaminate"](spark, SF).collect()
    }
    exact_kept = {
        r["doc_id"] for r in qs["x146_blocklist_filter"](spark, SF).collect()
    }
    assert bloom_kept <= exact_kept
    assert len(exact_kept - bloom_kept) == 0  # no FP at fixture scale


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def token_counts(spark, catalog):
    from dirty_js_etl_spark.operators.text import tokens

    docs = catalog.read("documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    ).cache()


def test_cms_never_underestimates(spark, token_counts):
    sk = cms_sketch(token_counts, "token", "c", depth=4, width=16)
    est = cms_estimate(token_counts.select("token"), sk, "token", 4, 16)
    joined = est.join(token_counts, "token").collect()
    assert len(joined) == token_counts.count()
    assert all(r["est_count"] >= r["c"] for r in joined)


def test_cms_exact_without_collisions(spark, token_counts):
    # width >> vocabulary -> each token owns its buckets -> est == exact
    sk = cms_sketch(token_counts, "token", "c", depth=4, width=1 << 12)
    est = cms_estimate(
        token_counts.select("token"), sk, "token", 4, 1 << 12
    )
    diffs = (
        est.join(token_counts, "token")
        .filter(F.col("est_count") != F.col("c"))
        .count()
    )
    assert diffs == 0


def test_cms_unseen_key_estimates_zero_or_collision(spark, token_counts):
    sk = cms_sketch(token_counts, "token", "c", depth=4, width=1 << 12)
    unseen = spark.createDataFrame(
        [("zzz-not-a-fixture-token",)], ["token"]
    )
    [r] = cms_estimate(unseen, sk, "token", 4, 1 << 12).collect()
    assert r["est_count"] == 0  # wide grid: all 4 probe buckets empty


def test_cms_merge_equals_single_build(spark, token_counts):
    """Cell-wise sum of two shard sketches == the one-shot sketch (the
    mergeability contract that makes CMS rollup-able across days)."""
    a = token_counts.filter(F.col("token") < "m")
    b = token_counts.filter(F.col("token") >= "m")
    merged = (
        cms_sketch(a, "token", "c", 4, 16)
        .unionByName(cms_sketch(b, "token", "c", 4, 16))
        .groupBy("row", "bucket")
        .agg(F.sum("bucket_count").alias("bucket_count"))
    )
    one_shot = cms_sketch(token_counts, "token", "c", 4, 16)
    sym_diff = merged.exceptAll(one_shot).count() + one_shot.exceptAll(
        merged
    ).count()
    assert sym_diff == 0


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted_vectors(spark):
    """40 vectors in 4 well-separated direction groups, with exact
    duplicates planted: ids 100+g duplicate id g (g = 0..3 group
    anchors) and 200 duplicates 100."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = np.eye(4)
    rows = []
    vid = 0
    for g in range(4):
        for _ in range(9):
            v = base[g] + rng.standard_normal(4) * 0.1
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for g in range(4):  # exact duplicates of the first member of each group
        rows.append((100 + g, rows[g * 9][1]))
    rows.append((200, rows[36][1]))  # triple: 0-anchor dup'd twice
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_dedup_invariants(planted_vectors):
    out = semantic_dedup(
        planted_vectors, threshold=0.999, n_centroids=4,
        id_col="vec_id", vec_col="embedding",
    ).collect()
    assert len(out) == planted_vectors.count()  # verdict for every row
    kept = {r["vec_id"] for r in out if r["kept"]}
    dropped = {r["vec_id"] for r in out if not r["kept"]}
    # every planted exact duplicate resolves to its smaller-id original
    assert {100, 101, 102, 103, 200} <= dropped
    assert kept | dropped == {r["vec_id"] for r in out}
    # and every drop is justified: a smaller-id near-dup (>= threshold)
    # exists in the full set (cell-mates by construction for exact dups)
    from dirty_js_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    pairs = embedding_near_dup_pairs(
        planted_vectors, threshold=0.999
    ).collect()
    justified = {p["id_b"] for p in pairs}
    assert dropped <= justified


def test_semantic_dedup_kept_set_is_nearly_unique(planted_vectors):
    """No two KEPT rows in the same cell are near-duplicates — the
    independent-set guarantee of the parallel keep-smallest-id rule."""
    from dirty_js_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    out = semantic_dedup(
        planted_vectors, threshold=0.999, n_centroids=4,
        id_col="vec_id", vec_col="embedding",
    )
    kept_ids = {r["vec_id"] for r in out.collect() if r["kept"]}
    kept_df = planted_vectors.filter(
        F.col("vec_id").isin([int(i) for i in kept_ids])
    )
    cell_of = {r["vec_id"]: r["cell"] for r in out.collect()}
    pairs = embedding_near_dup_pairs(kept_df, threshold=0.999).collect()
    same_cell = [
        p for p in pairs if cell_of[p["id_a"]] == cell_of[p["id_b"]]
    ]
    assert same_cell == []


def test_semantic_dedup_query_shape(spark):
    out = all_queries()["x148_semantic_dedup"](spark, SF)
    rows = out.collect()
    emb_count = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == emb_count
    assert set(out.columns) == {"vec_id", "cell", "kept"}
    assert all(isinstance(r["kept"], bool) for r in rows)


# ---------------------------------------------------------------------------
# Streaming CMS
# ---------------------------------------------------------------------------


def test_streaming_cms_grid_equals_one_shot(spark, catalog):
    """Two hand-fed batches through StreamingCms == one-shot cms_sketch
    over the union — the associativity that makes x150 oracle-exact."""
    from dirty_js_etl_spark.streaming.sketch import StreamingCms

    events = catalog.read("events")
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    state = StreamingCms(spark, depth=4, width=8)
    for part in (a, b):
        state.apply_batch(
            part.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")),
            "event_type",
            "c",
        )
    from dirty_js_etl_spark.operators.sketch import cms_sketch

    one_shot = cms_sketch(counts, "event_type", "c", depth=4, width=8)
    sym = state.grid.exceptAll(one_shot).count() + one_shot.exceptAll(
        state.grid
    ).count()
    assert sym == 0
    assert state.batches == 2


# ---------------------------------------------------------------------------
# Bloom-join (bloom_prune): exact-equivalence + selectivity
# ---------------------------------------------------------------------------


def test_bloom_prune_join_equivalence(spark, catalog):
    from dirty_js_etl_spark.operators.sketch import bloom_prune

    orders = catalog.read("orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    li = catalog.read("lineitem").select("l_orderkey", "l_linenumber")
    pruned = bloom_prune(
        li, F.col("l_orderkey"), orders, F.col("o_orderkey")
    )
    exact = li.join(orders, li.l_orderkey == orders.o_orderkey)
    via_bloom = pruned.join(orders, pruned.l_orderkey == orders.o_orderkey)
    a = sorted((r[0], r[1]) for r in exact.select("l_orderkey", "l_linenumber").collect())
    b = sorted((r[0], r[1]) for r in via_bloom.select("l_orderkey", "l_linenumber").collect())
    assert a == b  # no false negatives, FPs removed by the exact join


def test_bloom_prune_reduces_fact_side(spark, catalog):
    from dirty_js_etl_spark.operators.sketch import bloom_prune

    orders = catalog.read("orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    li = catalog.read("lineitem").select("l_orderkey")
    n_all = li.count()
    n_pruned = bloom_prune(
        li, F.col("l_orderkey"), orders, F.col("o_orderkey")
    ).count()
    n_true = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    # keeps every true match; FP overhead stays small at this m/n
    assert n_true <= n_pruned < n_all * 0.5


def test_rolling_hll_wau_error_bound(spark):
    from dirty_js_etl_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    approx = {
        r["day"]: r["wau7_approx"]
        for r in Q._REGISTRY["x154_rolling_hll_wau"].fn(spark, sf).collect()
    }
    exact = {
        r["day"]: r["wau7"]
        for r in Q._REGISTRY["x145_rolling_active_users"].fn(spark, sf).collect()
    }
    assert set(approx) == set(exact)
    for day, e in exact.items():
        assert abs(approx[day] - e) <= max(0.05 * e, 2), (day, approx[day], e)


class TestHllPortable:
    def test_shard_merge_equals_direct(self, spark, catalog):
        # register-wise max over shard register tables == whole-corpus
        # registers (HLL mergeability, exact by max associativity)
        from pyspark.sql import functions as F

        from dirty_js_etl_spark.operators.sketch import hll_portable

        ev = catalog.read("events")
        direct = hll_portable(ev, F.col("user_id"), p=4)
        shards = [
            hll_portable(
                ev.filter(F.col("event_id") % 2 == i), F.col("user_id"), p=4
            ).select("register", "rho")
            for i in (0, 1)
        ]
        merged = (
            shards[0].unionByName(shards[1])
            .groupBy("register")
            .agg(F.max("rho").alias("rho"))
        )
        d = {r.register: r.rho for r in direct.collect()}
        m = {r.register: r.rho for r in merged.collect()}
        assert d == m

    def test_estimate_error_bound(self, spark, catalog):
        # raw HLL at m=16 has relative std error ~1.04/sqrt(16) = 26%;
        # gate at 3 sigma on the fixture
        from pyspark.sql import functions as F

        from dirty_js_etl_spark.operators.sketch import hll_portable

        ev = catalog.read("events")
        exact = ev.select("user_id").distinct().count()
        est = hll_portable(ev, F.col("user_id"), p=4).collect()[0].est_distinct
        assert abs(est - exact) / exact < 0.78, (est, exact)

    def test_deterministic_across_partitionings(self, spark, catalog):
        from pyspark.sql import functions as F

        from dirty_js_etl_spark.operators.sketch import hll_portable

        ev = catalog.read("events")
        a = sorted(map(tuple, hll_portable(ev.repartition(3), F.col("user_id")).collect()))
        b = sorted(map(tuple, hll_portable(ev.repartition(17), F.col("user_id")).collect()))
        assert a == b
