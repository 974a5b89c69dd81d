"""Embedding similarity search: brute-force cosine top-k (exact baseline)
and random-hyperplane LSH bucketing (the scale path). North-star M4.

Scale design:

- Query sets are small by nature → **broadcast the queries**, stream the
  corpus: the corpus never shuffles, the whole scoring stage is map-only
  over corpus partitions, and the only shuffle is the final per-query
  top-k (tiny: k rows per partition after partial ranking).
- Dot products are ``zip_with`` + ``aggregate`` double expressions —
  JVM-side, codegen'd; floats are cast to double *before* multiplying so
  scores are bit-deterministic and engine-comparable.
- The LSH variant is multi-table (OR-amplified) random-hyperplane
  hashing: ``n_tables`` independent tables of ``bits_per_table`` sign
  bits each (driver-side seeded numpy planes embedded as literal
  arrays). A pair is a candidate if it collides in ANY table — recall
  amplifies as 1-(1-p^b)^L while per-table pruning stays 2^b. More bits
  → more pruning; more tables → more recall. The post-join shuffle is
  proportional to the *candidate* set, not the corpus.
- Exact top-k uses ``row_number`` over (score desc, id) — total order, no
  ties ambiguity, stable across engines given the deterministic scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank).

    Broadcast-join the (small) query set against the streamed corpus;
    self-matches excluded. Scores rounded before ranking so rank order is
    reproducible across engines; ties broken by neighbor id.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cvec"),
    ).withColumn("cnorm", l2_norm(F.col("cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qvec"),
    ).withColumn("qnorm", l2_norm(F.col("qvec")))

    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm")),
                round_digits,
            ),
        )
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).
    Exact O(n²/2) scoring — the correctness baseline; at corpus scale use
    :func:`lsh_topk`'s bucketing to prune, identical verify step."""
    a = df.select(
        F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va")
    ).withColumn("na", l2_norm(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb")
    ).withColumn("nb", l2_norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 8,
    bits_per_table: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for :func:`embedding_near_dup_pairs`: multi-table
    hyperplane LSH self-join prunes candidates, exact cosine verifies.

    At cos >= 0.95 (θ ≈ 18°, per-plane agreement ≈ 0.9) the defaults
    give expected recall 1-(1-0.9^8)^8 ≈ 0.99 while random pairs
    collide at ~(1/256)·8 ≈ 3% — an O(n²)→O(candidates) cut. Same
    output schema as the exact operator; recall < 1.0 by construction.
    """
    planes = _random_planes(n_tables * bits_per_table, dim, seed)
    base = (
        df.select(
            F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("n", l2_norm(F.col("v")))
        .withColumn(
            "tb",
            F.explode(
                table_buckets(F.col("v"), planes, n_tables, bits_per_table)
            ),
        )
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, (F.col("l.tb") == F.col("r.tb")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(
                dot(F.col("l.v"), F.col("r.v")) / (F.col("l.n") * F.col("r.n")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()  # a pair can collide in several tables
    )


def _random_planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means on a bounded, deterministic driver-side sample.

    ``orderBy(id).limit(sample_size)`` is a distributed take-ordered (each
    partition contributes its local top — no full sort), so training cost
    is independent of corpus size; only the tiny sample ever reaches the
    driver. Centroids are unit-normalized (spherical k-means: assignment
    by max dot product == max cosine)."""
    import numpy as np

    sample = (
        corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    x = np.array([r["v"] for r in sample], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent.tolist()


def _centroid_dots(vec: Column, centroids: list[list[float]]) -> list[Column]:
    return [
        dot(vec, F.array(*[F.lit(float(x)) for x in c])) for c in centroids
    ]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) partitioning.

    Each corpus row is assigned to its nearest centroid cell (argmax dot —
    a map-only JVM expression; the corpus never shuffles); each query
    probes its ``n_probe`` nearest cells, so only ~n_probe/n_centroids of
    the corpus is scored. Exact rescoring + rank on the candidates, same
    output schema as :func:`brute_force_topk`.

    Cells are disjoint, so unlike multi-table LSH no candidate dedup is
    needed; the only shuffle is the per-query top-k over candidates.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids=n_centroids, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cvec"),
    ).withColumn("cnorm", l2_norm(F.col("cvec")))
    cdots = F.array(*_centroid_dots(F.col("cvec"), centroids))
    # norm scaling doesn't change the argmax -> assign on raw dots
    c = c.withColumn(
        "cell", (F.array_position(cdots, F.array_max(cdots)) - 1).cast("int")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qvec"),
    ).withColumn("qnorm", l2_norm(F.col("qvec")))
    qstructs = F.array(
        *[
            F.struct(d.alias("d"), F.lit(i).alias("i"))
            for i, d in enumerate(_centroid_dots(F.col("qvec"), centroids))
        ]
    )
    probes = F.transform(
        F.slice(F.sort_array(qstructs, asc=False), 1, n_probe), lambda s: s["i"]
    )
    q = q.withColumn("cell", F.explode(probes))

    scored = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def table_buckets(
    vec: Column, planes: list[list[float]], n_tables: int, bits_per_table: int
) -> Column:
    """Array of (table, bucket) structs — one sign-bit bucket per table.

    Table ``t`` owns planes ``[t*b, (t+1)*b)``; bucket bit ``i`` is
    ``dot(v, plane) > 0``. All JVM-side expressions (no UDF)."""
    entries = []
    for t in range(n_tables):
        bucket: Column = F.lit(0)
        for i in range(bits_per_table):
            plane = planes[t * bits_per_table + i]
            p = F.array(*[F.lit(float(x)) for x in plane])
            bucket = bucket + F.when(dot(vec, p) > 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
        entries.append(
            F.struct(F.lit(t).alias("t"), bucket.alias("b"))
        )
    return F.array(*entries)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 16,
    bits_per_table: int = 4,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    Every row hashes to one bucket per table (map-only projection over
    the corpus — the corpus itself never shuffles); a (query, neighbor)
    pair becomes a candidate iff the buckets match in at least one table
    (OR-amplification: recall = 1-(1-p^b)^L where p = 1-θ/π). The join
    against the exploded, broadcast query probes prunes the candidate
    set ~2^b-fold per table before the exact cosine verify + rank, and
    the only shuffle (the distinct + window) is over *candidates*, not
    the corpus. Same output schema as :func:`brute_force_topk`; recall
    < 1.0 by construction.

    Defaults (L=16, b=4) are tuned for the adversarial case of weakly
    similar neighbors (cos ≈ 0.3 → ~0.88 recall). For real clustered
    corpora (near-dup cos ≥ 0.8) use ``bits_per_table=8..12`` for far
    stronger pruning at the same recall.
    """
    planes = _random_planes(n_tables * bits_per_table, dim, seed)
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cvec"),
        )
        .withColumn("cnorm", l2_norm(F.col("cvec")))
        .withColumn(
            "tb",
            F.explode(
                table_buckets(F.col("cvec"), planes, n_tables, bits_per_table)
            ),
        )
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("qvec"),
        )
        .withColumn("qnorm", l2_norm(F.col("qvec")))
        .withColumn(
            "tb",
            F.explode(
                table_buckets(F.col("qvec"), planes, n_tables, bits_per_table)
            ),
        )
    )

    scored = (
        c.join(F.broadcast(q), ["tb"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "score")
        .distinct()  # a (q, n) pair can collide in several tables
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# DataFrame-native k-means (Lloyd's iterations)
# ---------------------------------------------------------------------------


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Adds ``cluster`` (int) = index of the nearest centroid (squared
    L2; first index wins ties). The centroid list is embedded as plan
    literals — an implicit broadcast, no join."""
    v = as_double(F.col(vec_col))
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return df.withColumn(
        "cluster",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
) -> tuple[list[list[float]], DataFrame]:
    """Distributed Lloyd's k-means: centroids init from the first ``k``
    vectors in ``id_col`` order (deterministic, no RNG), then ``iters``
    rounds of assign (map-only, centroid literals) + recompute
    (posexplode → per-(cluster, dim) avg — ONE shuffle of narrow rows).

    Scale contract: only the k×dim centroid table ever reaches the
    driver (k·dim doubles per iteration); the corpus itself is never
    collected. Empty clusters keep their previous centroid. This is the
    engine's IVF trainer scaled past what a driver-side numpy sample
    can hold (cf. train_ivf_centroids).
    """
    dim = len(df.select(vec_col).first()[0])
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, centroids)
        rows = (
            assigned.select(
                "cluster",
                F.posexplode(as_double(F.col(vec_col))).alias("i", "x"),
            )
            .groupBy("cluster", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {c: list(old) for c, old in enumerate(centroids)}
        for r in rows:
            new[r["cluster"]][r["i"]] = r["m"]
        centroids = [new[c] for c in range(k)]
    return centroids, assign_clusters(df, vec_col, centroids)


def kmeans_inertia(assigned: DataFrame, vec_col: str, centroids) -> float:
    """Total within-cluster squared distance (the Lloyd objective)."""
    v = as_double(F.col(vec_col))
    dist_to = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return (
        assigned.select(
            F.element_at(dist_to, F.col("cluster") + 1).alias("d")
        )
        .agg(F.sum("d"))
        .first()[0]
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings into cells, then prune
    within-cell cosine near-duplicates, keeping one representative per
    duplicate neighborhood.

    Returns one row per input: ``(id, cell, kept)``.

    Divergence from the paper, documented: the representative is the
    *smallest id* in a duplicate pair, not the member closest to the
    centroid — an id-keyed rule is deterministic under any partitioning
    and needs no second centroid-distance pass. A row is dropped iff
    some smaller-id row in its cell is within ``threshold`` cosine of
    it (the partition-parallel relaxation of greedy keep-first; the
    exact sequential greedy is order-dependent and inherently serial —
    same relaxation trade-off as x42's connected-component canonical).

    Scale: cell assignment is a map-only argmax over centroid literals
    (corpus never shuffles to be assigned); candidate pairs are bounded
    to within-cell (the SemDeDup point: O(n²) → Σ O(|cell|²)); the
    self-join shuffles both sides on ``cell`` — at 100 TB, raise
    ``n_centroids`` so cells stay executor-sized (the paper runs 50k
    cells for 5B docs) and the trainer stays driver-bounded
    (sample-based, cf. train_ivf_centroids). Anti-join back to the full
    set is a shuffle on the (unique, uniform) id.
    """
    centroids = train_ivf_centroids(
        df, n_centroids=n_centroids, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    base = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", l2_norm(F.col("v")))
    dots = F.array(*_centroid_dots(F.col("v"), centroids))
    # spherical assignment: argmax dot == argmax cosine (norms factor out)
    cells = base.withColumn(
        "cell", (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    )
    l, r = cells.alias("l"), cells.alias("r")
    dropped = (
        l.join(
            r,
            (F.col("l.cell") == F.col("r.cell"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("l.v"), F.col("r.v"))
                / (F.col("l.n") * F.col("r.n")),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("r.id").alias("id"))
        .distinct()
    )
    return (
        cells.join(dropped.withColumn("__drop", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
    )


def rademacher_matrix(in_dim: int, out_dim: int, seed: int = 42) -> list[list[int]]:
    """Seeded ±1 (Rademacher) projection matrix, generated driver-side
    and embedded as plan literals — deterministic on every executor and
    reproducible by any other engine from the same seed."""
    import random

    rnd = random.Random(seed)
    return [
        [1 if rnd.random() < 0.5 else -1 for _ in range(in_dim)]
        for _ in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str,
    in_dim: int,
    out_dim: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project each
    embedding onto ``out_dim`` seeded ±1 directions — the standard
    pre-ANN compression (Achlioptas 2003: ±1 entries preserve pairwise
    distances in expectation like Gaussian projections, with integer
    arithmetic). Map-only: each output dim is one JVM fold over the
    vector against a literal row of the matrix; no shuffle, no UDF —
    100 TB of embeddings project in the scan stage. Adds columns
    ``p0..p{out_dim-1}`` (unnormalized; scale by 1/sqrt(out_dim) when
    distances must be comparable to the original space).
    """
    mat = rademacher_matrix(in_dim, out_dim, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df
    for j, row in enumerate(mat):
        lits = F.array(*[F.lit(float(e)) for e in row])
        dot = F.aggregate(
            F.zip_with(v, lits, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"p{j}", dot)
    return out


def ivf_topk_seeded(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Engine-portable IVF top-k — the hash-checkable twin of
    :func:`ivf_topk` (x18, rows-only), closing the last approximate-ANN
    family without a verified variant (VERDICT r07 task 3).

    Identical pipeline shape to the production path — cell assignment is
    a map-only argmin over the streamed corpus, each query probes its
    ``n_probe`` nearest cells, candidates are exact-rescored, one
    shuffle for the per-query top-k — but every data-derived choice is
    deterministic on any engine:

    - **centroids** are the ``n_centroids`` corpus vectors with the
      lowest ``md5(id)`` (the x200 seeding move), collected driver-side
      (bounded: n_centroids rows) and embedded as plan literals — no
      trained floats, so both engines hold bit-identical centroids;
    - **distances** are squared-L2 sequential folds
      (``F.aggregate`` / ``list_reduce`` — same left-associated
      rounding), and both argmin and probe order tie-break through
      (distance, cell) struct ordering;
    - **scores** reuse the x8/x10-proven ``round(cosine, 6)`` spelling,
      ranks the (score desc, neighbor_id) total order.

    Recall behavior is the production trade (probes/centroids of the
    corpus scored); the *candidate set itself* is replayed by the
    oracle, so a hash mismatch would catch a wrong cell assignment, a
    wrong probe order, or a wrong rescore — not just a wrong count.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cvec"),
    )
    seeds = (
        c.select(
            "neighbor_id",
            "cvec",
            F.md5(F.col("neighbor_id").cast("string")).alias("hk"),
        )
        .orderBy("hk", "neighbor_id")
        .limit(n_centroids)
        .collect()
    )
    # ONE nested-array literal for the whole centroid matrix (r10):
    # the per-centroid spelling built 2 x n_centroids x dim separate
    # F.lit() Columns (≈2k py4j round-trips + a thousand-literal tree
    # re-analyzed on every run — x201's 3.3 s was mostly plan build,
    # not data). transform's (element, index) lambda recovers the cell
    # id from matrix position, so cell numbering, the zip_with/aggregate
    # left-fold arithmetic, and the (d, c) struct tie-break are all
    # unchanged — same oracle hash, ~20x smaller plan.
    matrix = F.lit([[float(x) for x in r["cvec"]] for r in seeds])

    def dstructs(vec: Column) -> Column:
        return F.transform(
            matrix,
            lambda cv, i: F.struct(
                F.aggregate(
                    F.zip_with(vec, cv, lambda x, cc: (x - cc) * (x - cc)),
                    F.lit(0.0),
                    lambda a, b: a + b,
                ).alias("d"),
                i.cast("int").alias("c"),
            ),
        )

    assigned = c.withColumn(
        "cell", F.array_min(dstructs(F.col("cvec"))).getField("c")
    ).withColumn("cnorm", l2_norm(F.col("cvec")))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qvec"),
    ).withColumn("qnorm", l2_norm(F.col("qvec")))
    probes = F.transform(
        F.slice(F.array_sort(dstructs(F.col("qvec"))), 1, n_probe),
        lambda s: s.getField("c"),
    )
    q = q.withColumn("cell", F.explode(probes))

    scored = (
        assigned.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# engine-portable quantized k-means (the x192/x149 portable-twin pattern)
# ---------------------------------------------------------------------------


def kmeans_portable(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
    scale: int = 100,
) -> DataFrame:
    """Lloyd's k-means whose EVERY arithmetic step is cross-engine
    exact, so a static SQL oracle can replay data-derived centroids
    bit-for-bit — the determinism twin of :func:`kmeans_lloyd` (x132,
    which keeps float centroids, k-means++-style seeding and an
    inertia-based stop as the production path).

    The three moves that make it portable:

    - vectors quantize to ints (``floor(x*scale)``), so per-cluster
      per-dim centroid sums are EXACT integers and each new centroid
      coordinate is ONE correctly-rounded IEEE division ``sum/count`` —
      identical bits in any engine;
    - squared distances fold sequentially over the array
      (``F.aggregate`` here, ``list_reduce`` in the oracle) — the same
      left-associated rounding on both sides, never a parallel float
      sum over group ROWS (whose order differs between engines);
    - seeding is the ``k`` lowest md5(id) vectors (a TakeOrdered, not a
      global sort), and argmin tie-breaks through a (dist, cluster)
      struct min.

    Returns (cluster, dim, centroid, n_members) — k*dim rows (a
    cluster that loses all members mid-iteration drops out, standard
    Lloyd behavior — deterministically in both engines). Scale:
    per iteration, one k×dim-row broadcast joins the corpus map-side
    (the distance fold is a HOF — interpreted, not codegen'd; fine for
    a verification twin) and the update is one narrow
    (cluster, pos, int) shuffle with map-side partial sums.
    """
    q = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * scale).cast("int")
        ).alias("qv"),
    )
    # TakeOrdered pulls the k seed rows to the driver (bounded: k
    # rows), and the cluster index is assigned in that collected order
    # — no global row_number window, which would be the one
    # single-partition WindowExec in the pipeline (int → double is
    # exact, so the literal centroids are bit-identical to the rows)
    seed_rows = (
        q.select("id", "qv", F.md5(F.col("id").cast("string")).alias("hk"))
        .orderBy("hk", "id")
        .limit(k)
        .collect()
    )
    cents = df.sparkSession.createDataFrame(
        [
            (cluster, [float(x) for x in r["qv"]])
            for cluster, r in enumerate(seed_rows)
        ],
        "cluster int, c array<double>",
    )
    for _ in range(iters):
        scored = q.crossJoin(F.broadcast(cents.select("cluster", "c"))).select(
            "id",
            "qv",
            "cluster",
            F.aggregate(
                F.zip_with(
                    "qv", "c", lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("dist"),
        )
        assign = (
            scored.groupBy("id", "qv")
            .agg(
                F.min(
                    F.struct(F.col("dist").alias("d"), F.col("cluster").alias("c"))
                ).alias("m")
            )
            .select("id", "qv", F.col("m.c").alias("cluster"))
        )
        sums = (
            assign.select("cluster", F.posexplode("qv").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").cast("long").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        cents = sums.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                lambda t: t.getField("s") / t.getField("n"),
            ).alias("c"),
            F.min("n").alias("n"),
        )
    return cents.select(
        F.col("cluster").cast("int"),
        F.posexplode("c").alias("pos", "centroid"),
        F.col("n").cast("long").alias("n_members"),
    ).select(
        "cluster",
        (F.col("pos") + 1).cast("int").alias("dim"),
        "centroid",
        "n_members",
    )
