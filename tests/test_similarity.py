"""Similarity-search tests: brute-force correctness on a constructed
geometry, LSH recall against the brute-force baseline, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0]),  # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.8, 0.2, 0.0]),  # second closest to 0
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_brute_force_ordering(spark, vecs):
    out = brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=4)
    ranked = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert ranked == [1, 4, 2, 3]
    scores = {r["neighbor_id"]: r["score"] for r in out.collect()}
    assert scores[1] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    assert scores[3] == -1.0


def test_near_dup_pairs_threshold(spark, vecs):
    pairs = embedding_near_dup_pairs(vecs, threshold=0.99)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 4) in found  # cos(1,4) ~ 0.997
    assert (0, 2) not in found


def test_lsh_recall_on_fixture(spark, catalog):
    """LSH top-k must recover >=60% of brute-force top-10 neighbors on the
    fixture embeddings (16 tables x 4 bits — the fixture vectors are
    near-random, the adversarial case for LSH) while pruning candidate
    pairs; exactness is delegated to the verify step so every returned
    score equals the brute-force score for that pair."""
    emb = catalog.read("embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=10)
    approx = lsh_topk(emb, queries, k=10, n_tables=16, bits_per_table=4)
    e = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]): r["score"] for r in approx.collect()}
    overlap = set(e) & set(a)
    assert len(overlap) / len(e) >= 0.6
    for pair in overlap:
        assert e[pair] == a[pair]  # identical verified scores


def test_ivf_recall_on_fixture(spark, catalog):
    """IVF top-k must recover >=60% of brute-force top-10 on the fixture
    (probing 6 of 16 cells on near-random vectors — the adversarial case;
    clustered corpora need far fewer probes). Scores on recovered pairs
    are exact (rescoring step)."""
    from dirty_js_etl_spark.operators.similarity import ivf_topk

    emb = catalog.read("embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=6)
    e = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]): r["score"] for r in approx.collect()}
    overlap = set(e) & set(a)
    assert len(overlap) / len(e) >= 0.6
    for pair in overlap:
        assert e[pair] == a[pair]


@pytest.fixture(scope="module")
def clustered(spark):
    """Clustered operating point: 8 well-separated unit-norm centers in
    64-dim, 40 members each at sigma=0.05 noise (within-cluster cosine
    ~0.85+, cross-cluster ~0). The fixture embeddings are near-random —
    LSH/IVF's adversarial case, gated at 0.6; on clustered corpora the
    same defaults must deliver >=0.9."""
    import random

    rng = random.Random(42)
    centers = []
    for _ in range(8):
        v = [rng.gauss(0, 1) for _ in range(64)]
        nrm = math.sqrt(sum(x * x for x in v))
        centers.append([x / nrm for x in v])
    rows, vid = [], 0
    for ctr in centers:
        for _ in range(40):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in ctr]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).cache()


def _recall(exact_df, approx_df):
    e = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact_df.collect()}
    a = {(r["query_id"], r["neighbor_id"]): r["score"] for r in approx_df.collect()}
    overlap = set(e) & set(a)
    for pair in overlap:
        assert e[pair] == a[pair]  # rescoring: identical verified scores
    return len(overlap) / len(e)


def test_lsh_recall_clustered_defaults(spark, clustered):
    """Second operating point (VERDICT r06 #6): on a clustered corpus the
    DEFAULT table shape (16 x 4 bits) must recover >=90% of brute-force
    top-10 — P(bucket collision) per table ~0.5 at within-cluster
    angles, so 16 tables push miss probability below 1e-5."""
    queries = clustered.filter(F.col("vec_id") % 40 == 0)  # 1 per cluster
    exact = brute_force_topk(clustered, queries, k=10)
    approx = lsh_topk(clustered, queries, k=10)
    assert _recall(exact, approx) >= 0.9


def test_ivf_recall_clustered_defaults(spark, clustered):
    """On naturally-clustered data the DEFAULT probe budget (4 of 16
    cells) must recover >=90%: k-means centroids land on the true
    clusters, so a query's own cluster is inside its first probes."""
    from dirty_js_etl_spark.operators.similarity import ivf_topk

    queries = clustered.filter(F.col("vec_id") % 40 == 0)
    exact = brute_force_topk(clustered, queries, k=10)
    approx = ivf_topk(clustered, queries, k=10)
    assert _recall(exact, approx) >= 0.9


def test_ivf_seeded_recall_and_exact_rescore(spark, clustered):
    """The portable twin (x201) keeps the production trade: seeded
    centroids are real corpus vectors, so on clustered data a query's
    own cluster is still its nearest cells and 4-of-16 probes recover
    most of brute-force top-10; every recovered pair carries the
    identical exact-rescored score (checked inside _recall)."""
    from dirty_js_etl_spark.operators.similarity import ivf_topk_seeded

    queries = clustered.filter(F.col("vec_id") % 40 == 0)
    exact = brute_force_topk(clustered, queries, k=10)
    approx = ivf_topk_seeded(clustered, queries, k=10)
    assert _recall(exact, approx) >= 0.7


def test_near_dup_lsh_recall_vs_exact(spark, catalog):
    """LSH near-dup must recover >=90% of the exact cos>=0.95 pairs on
    the fixture, with identical verified scores on recovered pairs."""
    from dirty_js_etl_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )

    emb = catalog.read("embeddings")
    # fixture near-dup pairs sit at cos 0.4-0.5 (weak) -> band shape
    # tuned to that angle; real >=0.9 corpora use the API defaults
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_dup_pairs_lsh(
            emb, threshold=0.4, n_tables=16, bits_per_table=4
        ).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    overlap = set(exact) & set(approx)
    assert len(overlap) / len(exact) >= 0.9
    assert not set(approx) - set(exact)  # verify step: no false positives
    for pair in overlap:
        assert exact[pair] == approx[pair]


def test_corpus_not_shuffled_for_topk(spark, catalog):
    """Plan shape: queries broadcast, corpus side has no exchange before
    the join (the scoring stage is map-only over corpus partitions)."""
    emb = catalog.read("embeddings")
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


class TestKMeans:
    def test_inertia_non_increasing_and_full_coverage(self, spark, catalog):
        from dirty_js_etl_spark.operators.similarity import (
            assign_clusters,
            kmeans_inertia,
            kmeans_lloyd,
        )

        emb = catalog.read("embeddings")
        n = emb.count()
        # iteration-0 objective: init centroids, no refinement
        init_cent, _ = kmeans_lloyd(
            emb, vec_col="embedding", id_col="vec_id", k=8, iters=0
        )
        i0 = kmeans_inertia(
            assign_clusters(emb, "embedding", init_cent), "embedding", init_cent
        )
        cent3, assigned = kmeans_lloyd(
            emb, vec_col="embedding", id_col="vec_id", k=8, iters=3
        )
        i3 = kmeans_inertia(assigned, "embedding", cent3)
        assert i3 <= i0 + 1e-9  # Lloyd never increases the objective
        assert assigned.count() == n  # every vector assigned
        assert assigned.filter(
            (F.col("cluster") < 0) | (F.col("cluster") >= 8)
        ).count() == 0

    def test_objective_stable_across_partitionings(self, spark, catalog):
        from dirty_js_etl_spark.operators.similarity import (
            kmeans_inertia,
            kmeans_lloyd,
        )

        emb = catalog.read("embeddings")
        _, a1 = kmeans_lloyd(
            emb.repartition(2), "embedding", "vec_id", k=4, iters=2
        )
        c2, a2 = kmeans_lloyd(
            emb.repartition(17), "embedding", "vec_id", k=4, iters=2
        )
        # float avg order may differ at the last ULP, but the objective
        # must agree to analytic tolerance
        i1 = kmeans_inertia(a1, "embedding", c2)
        i2 = kmeans_inertia(a2, "embedding", c2)
        assert abs(i1 - i2) / max(abs(i2), 1e-9) < 1e-6


def test_random_projection_jl_properties(spark, catalog):
    # Two JL properties that DO hold on isotropic data (pairwise-rank
    # checks don't — concentration makes all random-pair distances
    # nearly equal): (1) norm preservation in expectation,
    # E[||Pv||²/out_dim] = ||v||²; (2) planted contrast — a vector's
    # small perturbation stays far closer in projected space than a
    # random other vector.
    import statistics

    from dirty_js_etl_spark.operators.similarity import random_projection

    emb = catalog.read("embeddings").limit(40)
    proj = {
        r["vec_id"]: [r[f"p{j}"] for j in range(8)]
        for r in random_projection(emb, "embedding", 64, 8).collect()
    }
    orig = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    ratios = [
        (sum(x * x for x in proj[i]) / 8)
        / sum(float(x) ** 2 for x in orig[i])
        for i in orig
    ]
    assert 0.7 < statistics.mean(ratios) < 1.3, statistics.mean(ratios)

    # planted near-neighbor: v + tiny noise
    ids = sorted(orig)[:10]
    spark_rows = [
        (1000 + i, [float(x) + (0.001 * ((j * 7 + i) % 3 - 1)) for j, x in enumerate(orig[i])])
        for i in ids
    ]
    near = spark.createDataFrame(
        spark_rows, "vec_id long, embedding array<double>"
    )
    pnear = {
        r["vec_id"]: [r[f"p{j}"] for j in range(8)]
        for r in random_projection(near, "embedding", 64, 8).collect()
    }

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    other = sorted(orig)[10:20]
    for i, o in zip(ids, other):
        assert d2(proj[i], pnear[1000 + i]) < d2(proj[i], proj[o])


def test_random_projection_deterministic(spark, catalog):
    from dirty_js_etl_spark.operators.similarity import random_projection

    emb = catalog.read("embeddings").limit(50)
    a = sorted(map(tuple, random_projection(emb, "embedding", 64, 4).select(
        "vec_id", "p0", "p1", "p2", "p3").collect()))
    b = sorted(map(tuple, random_projection(emb.repartition(5), "embedding", 64, 4).select(
        "vec_id", "p0", "p1", "p2", "p3").collect()))
    assert a == b


def test_kmeans_portable_partition_and_determinism(spark, catalog):
    from dirty_js_etl_spark.operators.similarity import kmeans_portable

    emb = catalog.read("embeddings")
    n = emb.count()
    out = kmeans_portable(emb, "vec_id", "embedding", k=4, iters=2).cache()
    rows = out.collect()
    clusters = {r.cluster for r in rows}
    dims = {r.dim for r in rows}
    assert len(rows) == len(clusters) * 64 and dims == set(range(1, 65))
    # member counts partition the input (clusters may drop, never overlap)
    sizes = {r.cluster: r.n_members for r in rows}
    assert sum(sizes.values()) == n
    # byte-level determinism across two independent builds
    again = kmeans_portable(emb, "vec_id", "embedding", k=4, iters=2).collect()
    key = lambda r: (r.cluster, r.dim)
    assert sorted(((r.cluster, r.dim, r.centroid, r.n_members) for r in rows)) == \
           sorted(((r.cluster, r.dim, r.centroid, r.n_members) for r in again))
