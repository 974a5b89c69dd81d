"""Entity resolution / record linkage: blocked candidate generation,
edit-distance scoring, and transitive entity assembly.

The classic large-scale pipeline for "which records describe the same
real-world thing": never all-pairs — a BLOCKING key (a cheap, high-
recall hash of the record: phonetic code, sorted-token prefix, a
category column) bounds candidate generation to within-block pairs,
an edit-distance (or any pair scorer) prunes them, and connected
components over the surviving matches assign one entity id per group
(``operators/dedup.py::dup_clusters`` — the same min-label pointer-
jumping components used for document near-dup clusters; record
linkage IS near-dup dedup over structured records).

Reference scope note: the reference engine has no linkage operator
(its closest concept is the FK memo join, ``mappr.js:290-294``);
this module is SURVEY.md §2.3 extension surface — a first-class
training-data-pipeline capability (catalog dedup before corpus
construction).

Scale notes:

- the block join is ONE shuffle on the block key; candidate work is
  Σ_b |b|² — the operator's contract is that the caller's blocking
  key keeps blocks small, and ``max_block_size`` enforces it (an
  over-hot block — every record blocking to the same value — would
  quietly reintroduce the quadratic; dropping it mirrors the
  stop-shingle cap in the Jaccard pipelines);
- ``levenshtein`` is a JVM built-in (codegen'd, no UDF) evaluated
  INSIDE the join condition, so non-matches die in the join operator
  instead of surviving to a post-filter;
- entity assembly runs on the MATCH graph (pairs), never the full
  record set; unmatched records never enter a shuffle after the
  block join — they re-attach as singletons via one left join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.parallel import spread_for_cpu


def blocked_link_pairs(
    df: DataFrame,
    id_col: str,
    record_col: str | Column,
    block_col: str | Column,
    max_distance: int = 2,
    max_block_size: int = 10_000,
    dedup_values: bool = True,
) -> DataFrame:
    """Within-block record pairs with Levenshtein distance ≤
    ``max_distance``. Returns (id_a, id_b, distance), id_a < id_b.

    ``dedup_values`` (default True) collapses identical (record, block)
    VALUES to their min-id representative before pairing — the
    dedup-then-link discipline: on a duplicate-heavy catalog a c-member
    identical-value clique otherwise costs O(c²) join rows AND O(c²)
    output pairs carrying no information beyond the value pair (the
    10×-replica sf1 fixture made the record-level spelling emit 4.57M
    pairs in 283 s; value-level is ~100× smaller). Identity linking
    (same value ⇒ same entity) belongs to the exact-dedup pass /
    :func:`resolve_entities`'s representative mapping. The hot-block
    cap then counts distinct VALUES per block. ``dedup_values=False``
    restores raw record-pair enumeration."""
    rec = F.col(record_col) if isinstance(record_col, str) else record_col
    blk = F.col(block_col) if isinstance(block_col, str) else block_col
    recs = df.select(
        F.col(id_col).alias("id"), rec.alias("rec"), blk.alias("blk")
    )
    if dedup_values:
        # one value-keyed shuffle (map-side combined min); later stages
        # work on distinct (rec, blk) values, never clique members
        recs = recs.groupBy("rec", "blk").agg(F.min("id").alias("id"))
    sizes = recs.groupBy("blk").agg(F.count(F.lit(1)).alias("__n"))
    recs = (
        recs.join(sizes, "blk").filter(F.col("__n") <= max_block_size).drop("__n")
    )
    # probe side pinned to the configured parallelism: the per-row join
    # work here is |block| Levenshteins, so AQE's byte-based coalescing
    # (the value table is a few hundred KB) would fold the quadratic
    # enumeration to one task (r13 profile). NOTE (ADVICE r13): the pin
    # is keyed (blk, rec, id) for uniform spread, which does NOT satisfy
    # the join's blk-alone distribution — it only survives (and
    # parallelizes the Levenshtein work) while the build side stays
    # under the broadcast threshold, which holds exactly when
    # dedup_values keeps the value table dimension-sized. If the value
    # table outgrows the threshold at cluster scale, the planner inserts
    # its own blk exchange above this one (correct, but the pin becomes
    # a wasted shuffle of the few-hundred-KB value table — harmless).
    # No broadcast hint on the build side on purpose: a hint would turn
    # a mis-sized value table into an executor OOM instead of a silent
    # fallback to the shuffle join.
    l = spread_for_cpu(recs, "blk", "rec", "id").alias("l")
    r = recs.alias("r")
    dist = F.levenshtein(F.col("l.rec"), F.col("r.rec"))
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.id") < F.col("r.id"))
            & (dist <= max_distance),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            dist.cast("int").alias("distance"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    record_col: str | Column,
    block_col: str | Column,
    sort_key: str | Column | None = None,
    window: int = 4,
    max_distance: int = 2,
    dedup_values: bool = True,
) -> DataFrame:
    """Blocked sorted-neighborhood candidate pairs (the OTHER classic
    linkage generator): within each block, records sort by
    ``sort_key`` (default: the record itself) and each record pairs
    with the next ``window - 1`` in sort order, pruned by Levenshtein
    ≤ ``max_distance``. Catches near-matches hash blocking on the
    record value would split (a typo anywhere in the record usually
    leaves it sort-adjacent); run it as a second pass and union with
    :func:`blocked_link_pairs` for multi-pass linkage.

    Scale: the rank window partitions BY BLOCK (never a global sort),
    and the neighborhood join emits ≤ ``window - 1`` rows per record —
    linear in the corpus, no quadratic block term at all (this is why
    SNM is the pass of choice for blocks too hot to pair exhaustively).
    Returns (id_a, id_b, distance), id_a < id_b.

    ``dedup_values`` (default True) collapses identical
    (record, block, key) VALUES to their min-id representative before
    ranking — the same dedup-then-link discipline as
    :func:`blocked_link_pairs`, and here it also IMPROVES recall: a
    c-member identical-value clique otherwise occupies c consecutive
    ranks and crowds genuinely-near distinct values out of the
    neighborhood window, while emitting c·(window−1) no-information
    clique pairs (17.4 s at sf1 on the 10×-replica fixture; value
    level is sub-second and window slots go to distinct values).
    """
    from pyspark.sql import Window

    rec = F.col(record_col) if isinstance(record_col, str) else record_col
    blk = F.col(block_col) if isinstance(block_col, str) else block_col
    if sort_key is None:
        key = rec
    else:
        key = F.col(sort_key) if isinstance(sort_key, str) else sort_key
    recs = df.select(
        F.col(id_col).alias("id"), rec.alias("rec"), blk.alias("blk"),
        key.alias("key"),
    )
    if dedup_values:
        recs = recs.groupBy("rec", "blk", "key").agg(F.min("id").alias("id"))
    w = Window.partitionBy("blk").orderBy("key", "id")
    ranked = recs.withColumn("rn", F.row_number().over(w))
    l, r = ranked.alias("l"), ranked.alias("r")
    dist = F.levenshtein(F.col("l.rec"), F.col("r.rec"))
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("r.rn") - F.col("l.rn") > 0)
            & (F.col("r.rn") - F.col("l.rn") < window)
            & (dist <= max_distance),
        )
        .select(
            # each unordered pair appears exactly once (l.rn < r.rn),
            # so no distinct — id order is normalized, not deduped
            F.least(F.col("l.id"), F.col("r.id")).alias("id_a"),
            F.greatest(F.col("l.id"), F.col("r.id")).alias("id_b"),
            dist.cast("int").alias("distance"),
        )
    )


def lsh_link_pairs(
    df: DataFrame,
    id_col: str,
    record_col: str | Column,
    max_distance: int = 2,
    shingle_k: int = 3,
    num_perm: int = 32,
    bands: int = 16,
    seed: int = 42,
    max_bucket_size: int = 1000,
    hash_fn: Callable[[Column], Column] | None = None,
    portable_bands: bool = False,
    dedup_values: bool = True,
) -> DataFrame:
    """Third-pass candidate generator: MinHash-LSH blocks over the WHOLE
    record string, verified by Levenshtein ≤ ``max_distance``. Returns
    (id_a, id_b, distance), id_a < id_b.

    ``dedup_values`` (default True) collapses identical record VALUES to
    their min-id representative before banding, so the output pairs
    DISTINCT values only. This is the dedup-then-link discipline every
    production linkage pipeline applies before a pair enumerator:
    duplicate-heavy catalogs carry value cliques (c identical records),
    and enumerating record-level pairs inside them is O(c²) — on the
    10×-replica sf1 fixture the record-level spelling emits 52.9M pairs
    (~100× the value-level 0.5M) with zero information the value pairs
    don't carry. Identity linking (same value ⇒ same entity) belongs to
    the exact-dedup pass; union it with these value pairs (expanded
    through the value→id map) before :func:`resolve_entities`. Pass
    ``dedup_values=False`` to enumerate raw record pairs.

    Why it exists: :func:`blocked_link_pairs` blocks on an exact key
    (a typo in the blocking token itself escapes the block) and
    :func:`sorted_neighborhood_pairs` needs the typo to leave the
    record sort-adjacent (a typo in the sort prefix breaks that). LSH
    bands of the record's CHARACTER shingles have neither failure
    mode — and char grams, not word grams, are the right granularity
    for short linkage records: a 2-3 word descriptor carries ONE word
    shingle, so distinct values would never collide, while a
    single-character typo in an n-char record kills ≤ k of its
    ~n char-grams (J ≈ (n-2k)/n, caught with probability
    1-(1-J^rows)^bands — k=3, 16 bands × 2 rows: ≥ 0.99 at J ≥ 0.5).
    Union the three passes before :func:`resolve_entities` for
    multi-pass linkage.

    Scale: signature build is one map-side-combined aggregation over
    exploded shingles; the only corpus-scale shuffle is the
    (band, bucket) self-join, capped by ``max_bucket_size`` (the same
    hot-bucket guard as the near-dup LSH — a degenerate bucket would
    reintroduce the quadratic); the Levenshtein verify joins are
    candidate-cardinality. With ``portable_bands=True`` +
    ``portable_token_hash60`` every stage — shingles, signatures,
    band buckets, cap, candidates, distances — is recomputable by an
    ANSI-SQL oracle (the x6b replay idiom)."""
    from dirty_js_etl_spark.operators.dedup import (
        char_shingles,
        minhash_band_table,
    )

    rec = F.col(record_col) if isinstance(record_col, str) else record_col
    recs = df.select(F.col(id_col).alias("id"), rec.alias("rec"))
    if dedup_values:
        # one value-keyed shuffle (map-side combined min); every later
        # stage then works on distinct values, never on clique members
        recs = recs.groupBy("rec").agg(F.min("id").alias("id"))
    # NO spread on recs (r14 negative result, measured before reverting):
    # pinning the signature map's parallelism with spread_for_cpu(recs,
    # "id") below the shared subtree kept AQE stage reuse intact but
    # still regressed the bench in a flat-canary window (x208 1.64 →
    # 1.98 s, x209 4.25 → 4.51 s): the extra pinned exchange adds a
    # stage to every one of the four consumer paths, and the md5
    # signature work it parallelizes is not the critical path here
    # (x209's generator branches already back-fill the cores, the r13
    # finding; x208's signature stage is ~0.8 s of a 1.6 s query and
    # overlaps the band-count stage).
    bt = minhash_band_table(
        recs,
        "id",
        "rec",
        shingle_k=shingle_k,
        num_perm=num_perm,
        bands=bands,
        seed=seed,
        hash_fn=hash_fn,
        portable_bands=portable_bands,
        shingler=char_shingles,
    )
    ok = (
        bt.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket_size)
        .select("band", "bucket")
    )
    kept = bt.join(ok, ["band", "bucket"])
    l, r = kept.alias("l"), kept.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    ra = recs.select(F.col("id").alias("id_a"), F.col("rec").alias("__ra"))
    rb = recs.select(F.col("id").alias("id_b"), F.col("rec").alias("__rb"))
    dist = F.levenshtein(F.col("__ra"), F.col("__rb"))
    return (
        cands.join(ra, "id_a")
        .join(rb, "id_b")
        .filter(dist <= max_distance)
        .select("id_a", "id_b", dist.cast("int").alias("distance"))
    )


def _chunk_candidates(
    recs: DataFrame, field: str, d: int
) -> DataFrame:
    """Lossless PassJoin-style candidate pairs (Li, Deng, Feng 2011 —
    partition-based signatures for edit-distance joins): every pair
    with ``levenshtein(field_a, field_b) <= d`` must share a chunk —
    split a's field into ``d+1`` contiguous chunks; since ≤ d edits
    cannot destroy all d+1 chunks (pigeonhole), at least one occurs
    VERBATIM in b, and ≤ d edits shift its position by at most d. So
    the candidate join is an EQUI-join on (block, chunk index, partner
    length, chunk text): a emits its d+1 chunks keyed by its own
    length; b emits, for every assumed partner length within ±d of its
    own and every shift in [−d, d], the substring at the chunk's
    shifted position. Returns distinct (id_a, id_b), id_a < id_b, same
    block by construction.

    Scale: signature explosion is (d+1)·(2d+1)² rows per record on the
    probe side (75 at d=2) and d+1 on the anchor side — linear in the
    corpus, narrow rows — and the join is equi-keyed (one shuffle), so
    the quadratic within-block enumeration never happens; output is
    candidate-cardinality. NULL fields compare as '' (the caller's
    missing-as-empty contract)."""
    nch = d + 1
    fld = F.coalesce(F.col(field), F.lit(""))
    base = recs.select(
        "id", "blk", fld.alias("__s"), F.length(fld).alias("__n")
    )

    def start(j: int, nexpr: str) -> str:
        return f"(({j} * {nexpr}) DIV {nch}) + 1"

    def clen(j: int, nexpr: str) -> str:
        return (
            f"((({j + 1}) * {nexpr}) DIV {nch})"
            f" - (({j} * {nexpr}) DIV {nch})"
        )

    anchor_arr = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.expr(start(j, "__n")).cast("int").alias("p"),
            F.expr(clen(j, "__n")).cast("int").alias("ln"),
        )
        for j in range(nch)
    ])
    anchors = (
        base.select("id", "blk", "__s", "__n", F.explode(anchor_arr).alias("c"))
        .select(
            "id",
            "blk",
            F.col("__n").alias("alen"),
            F.col("c.j").alias("j"),
            F.col("__s").substr(F.col("c.p"), F.col("c.ln")).alias("sub"),
        )
    )
    probe_arr = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.expr(f"__n + {off}").cast("int").alias("alen"),
            F.expr(f"({start(j, f'(__n + {off})')}) + {shift}")
            .cast("int")
            .alias("p"),
            F.expr(clen(j, f"(__n + {off})")).cast("int").alias("ln"),
        )
        for off in range(-d, d + 1)
        for j in range(nch)
        for shift in range(-d, d + 1)
    ])
    probes = (
        base.select("id", "blk", "__s", "__n", F.explode(probe_arr).alias("c"))
        .filter(
            (F.col("c.alen") >= 0)
            & (F.col("c.p") >= 1)
            & (F.col("c.p") + F.col("c.ln") - 1 <= F.col("__n"))
        )
        .select(
            "id",
            "blk",
            F.col("c.alen").alias("alen"),
            F.col("c.j").alias("j"),
            F.col("__s").substr(F.col("c.p"), F.col("c.ln")).alias("sub"),
        )
    )
    a, b = anchors.alias("a"), probes.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.j") == F.col("b.j"))
            & (F.col("a.alen") == F.col("b.alen"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )


def weighted_link_pairs(
    df: DataFrame,
    id_col: str,
    fields: list[str | Column],
    weights: list[float],
    block_col: str | Column,
    max_score: float,
    max_block_size: int = 10_000,
    dedup_values: bool = True,
    prefilter: bool = True,
    chunk_field: int | None = None,
) -> DataFrame:
    """Weighted multi-field record pairs (Fellegi–Sunter-lite): within
    each block, pairs whose score = Σ wᵢ · levenshtein(fieldᵢ_a,
    fieldᵢ_b) is ≤ ``max_score``. Returns (id_a, id_b, score),
    id_a < id_b, score DOUBLE.

    Real catalogs weight per-field agreement — a brand mismatch should
    cost more than a typo in a free-text name — where
    :func:`blocked_link_pairs` scores one Levenshtein over the whole
    concatenated record (every character equally important). With a
    single field and weight 1.0 this degenerates exactly to
    :func:`blocked_link_pairs` (property-tested). NULL fields compare
    as empty strings (missing ≈ no evidence, costing that field's
    length — the replayable simplification of Fellegi–Sunter's
    missing-at-random term).

    Scale shape is :func:`blocked_link_pairs`' — value-level dedup
    first (min-id representative per distinct (fields…, block) tuple),
    the distinct-value hot-block cap, ONE block-keyed shuffle, and the
    weighted score evaluated INSIDE the join condition — plus two
    LOSSLESS per-field prefilters derived from the weights, ordered
    cheapest-first in the join conjunction: wᵢ·dᵢ ≤ score ≤ S forces
    dᵢ ≤ ⌊S/wᵢ⌋, so (a) a char-length difference > ⌊S/wᵢ⌋ (a lower
    bound on Levenshtein) rejects with two length() calls, and (b) the
    THRESHOLDED JVM levenshtein (banded O(n·cap) DP, Spark 3.5+)
    rejects without ever running the full O(n·m) DP; only survivors
    evaluate the exact score. Neither prefilter changes the output set
    (both are implied by score ≤ S with non-negative terms), so the
    ANSI-SQL oracle replays the plain score inequality. Literal weights
    keep every stage SQL-replayable (the x208 oracle idiom); weights
    chosen as binary-exact doubles (1.0, 0.5, 2.0 …) make the score
    sum bit-stable across engines.

    ``chunk_field`` (r11) switches candidate GENERATION from the
    quadratic within-block enumeration to the lossless PassJoin
    chunk-signature equi-join on that field (:func:`_chunk_candidates`
    — its per-field cap dᵢ = ⌊S/wᵢ⌋ is implied by score ≤ S, so every
    qualifying pair is generated; the full score verifies after). Pick
    the longest/most-selective capped field. Output is IDENTICAL
    (hypothesis-tested against the brute force both ways); at sf0.1 the
    x210 shape drops from 4.4M enumerated block pairs to
    candidate-cardinality and ~2× wall. The ±d shift window and the
    (d+1)-partition make the signature join's fan-out
    (d+1)·(2d+1)² per probe record — constant, corpus-linear."""
    if len(fields) != len(weights):
        raise ValueError("fields and weights must align")
    if any(w < 0 for w in weights):
        raise ValueError("weights must be non-negative")
    if chunk_field is not None and not (
        0 <= chunk_field < len(weights) and weights[chunk_field] > 0
    ):
        raise ValueError("chunk_field must index a positive-weight field")
    blk = F.col(block_col) if isinstance(block_col, str) else block_col
    cols = [
        (F.col(f) if isinstance(f, str) else f).alias(f"f{i}")
        for i, f in enumerate(fields)
    ]
    recs = df.select(F.col(id_col).alias("id"), *cols, blk.alias("blk"))
    fnames = [f"f{i}" for i in range(len(fields))]
    if dedup_values:
        recs = recs.groupBy(*fnames, "blk").agg(F.min("id").alias("id"))
    sizes = recs.groupBy("blk").agg(F.count(F.lit(1)).alias("__n"))
    recs = (
        recs.join(sizes, "blk").filter(F.col("__n") <= max_block_size).drop("__n")
    )
    # per-record field lengths computed ONCE before the self-join (r11):
    # the length-difference guards fire on every candidate pair, and
    # referencing precomputed ints beats re-evaluating length() twice
    # per field per pair inside the join condition
    recs = recs.select(
        "*",
        *[
            F.length(F.coalesce(F.col(fn), F.lit(""))).alias(f"__len_{fn}")
            for fn in fnames
        ],
    )
    # probe side pinned to the configured parallelism: per-row join work
    # is |block| guarded Levenshteins; AQE's byte-based coalescing folds
    # the saturated value table (a few hundred KB) to ONE task otherwise
    # (r13 profile: x210's enumeration was a single 4.5 s task). Same
    # ADVICE-r13 caveat as blocked_link_pairs: keys (blk, fields…) don't
    # satisfy the join's blk-alone distribution, so the pin relies on
    # the build side broadcasting (true while the value-deduped table is
    # dimension-sized); above the threshold the planner adds its own blk
    # exchange and the pin degrades to one wasted small shuffle. No
    # broadcast hint on purpose — fallback beats a forced-broadcast OOM.
    l = spread_for_cpu(recs, "blk", *fnames).alias("l")
    r = recs.alias("r")
    cond = (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id"))
    pairs = []
    lens = []
    for w, fn in zip(weights, fnames):
        fl = F.coalesce(F.col(f"l.{fn}"), F.lit(""))
        fr = F.coalesce(F.col(f"r.{fn}"), F.lit(""))
        pairs.append((float(w), fl, fr))
        lens.append((F.col(f"l.__len_{fn}"), F.col(f"r.__len_{fn}")))
    # guard order: all length-diff bounds first (two length() calls),
    # then banded levenshteins smallest-cap-first — the tightest cap is
    # both the cheapest DP band and usually the most selective conjunct
    # (short-circuit AND kills most pairs on it). ``prefilter=False``
    # drops both lossless guards (the A/B spelling — identical output,
    # every pair pays the full DP score).
    if prefilter:
        guarded = sorted(
            (
                (int(max_score // w), fl, fr, ll, lr)
                for (w, fl, fr), (ll, lr) in zip(pairs, lens)
                if w > 0
            ),
            key=lambda t: t[0],
        )
        # lossless prefilter pass 1: length-difference lower bound per
        # field, over the precomputed per-record lengths
        for cap, _fl, _fr, ll, lr in guarded:
            cond = cond & (F.abs(ll - lr) <= F.lit(cap))
        # lossless prefilter pass 2: banded thresholded levenshtein per
        # field (returns -1 above the threshold — never runs the full DP)
        for cap, fl, fr, _ll, _lr in guarded:
            cond = cond & (F.levenshtein(fl, fr, cap) >= 0)
    score = None
    for w, fl, fr in pairs:
        term = F.lit(w) * F.levenshtein(fl, fr)
        score = term if score is None else score + term
    if chunk_field is not None:
        # PassJoin path: equi-join chunk signatures generate the
        # candidates; the ORIGINAL full condition (block, order,
        # guards, exact score) verifies them — so the output set is
        # the same, only the enumeration strategy changed. Candidates
        # are (least, greatest)-normalized, so id_a < id_b holds and
        # cond's l.id < r.id conjunct is satisfied by joining l on
        # id_a / r on id_b.
        d = int(max_score // weights[chunk_field])
        cands = _chunk_candidates(recs, fnames[chunk_field], d)
        return (
            cands.join(l, F.col("id_a") == F.col("l.id"))
            .join(r, F.col("id_b") == F.col("r.id"))
            .filter(cond & (score <= max_score))
            .select(
                "id_a",
                "id_b",
                score.cast("double").alias("score"),
            )
        )
    return (
        l.join(r, cond & (score <= max_score))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            score.cast("double").alias("score"),
        )
    )


def multi_pass_resolve(
    df: DataFrame,
    id_col: str,
    record_col: str | Column,
    pairs: list[DataFrame],
    reps: DataFrame | None = None,
) -> DataFrame:
    """One entity id per record from the UNION of several candidate
    passes — the composed pipeline the linkage family exists for
    (catalog dedup runs exact-key blocking + sorted neighborhood + LSH
    and resolves over everything they found). Returns (id, entity_id).

    ``pairs`` are (id_a, id_b[, ...]) match pairs from any mix of
    :func:`blocked_link_pairs` / :func:`sorted_neighborhood_pairs` /
    :func:`lsh_link_pairs` over the SAME ``record_col``. Each pass
    value-dedups under its own keying (rec+block vs rec only), so pair
    endpoints may name different representatives of the same record
    value; both endpoints are first canonicalized to the RECORD-value
    representative (min id per distinct record string) through one
    id→rep map — identical record values always co-resolve (identity
    linking is the exact-dedup pass), and components then run on the
    value-level union graph, never on clique members. Scale shape:
    one value-keyed shuffle for the rep map, candidate-cardinality
    joins to canonicalize, pointer-jumping components on the pair
    graph only, and a final value-keyed re-attach.

    NULL record values are PER-RECORD SINGLETONS (ADVICE r10): missing
    data is not evidence of identity, so a NULL-rec record keeps its
    own id as its representative instead of fusing with every other
    NULL-rec record (at corpus scale one NULL-heavy column would
    silently merge millions of rows into one entity). Such records
    still resolve into an entity when a pair set names their id
    directly (canonicalization maps them to themselves).

    ``reps`` (optional) is a precomputed ``(rec, rep)`` representative
    map — min id per DISTINCT NON-NULL record value of ``df`` — for
    callers that already materialized one (the x209 idiom: the same
    localCheckpointed rep table feeds the LSH generator's
    ``dedup_values=False`` path and this resolve, so the value-dedup
    shuffle runs once per pipeline instead of once per stage). Must be
    derived from the same ``df``/``record_col``; when omitted it is
    computed here."""
    from dirty_js_etl_spark.operators.dedup import dup_clusters

    if not pairs:
        raise ValueError("multi_pass_resolve needs at least one pair set")
    rec = F.col(record_col) if isinstance(record_col, str) else record_col
    recs = df.select(F.col(id_col).alias("id"), rec.alias("rec"))
    if reps is None:
        reps = (
            recs.filter(F.col("rec").isNotNull())
            .groupBy("rec")
            .agg(F.min("id").alias("rep"))
        )
    n, p = recs.alias("n"), reps.alias("p")
    id2rep = n.join(
        p, F.col("n.rec") == F.col("p.rec"), "left"
    ).select(
        F.col("n.id").alias("id"),
        F.coalesce(F.col("p.rep"), F.col("n.id")).alias("rep"),
    )

    allp = None
    for pr in pairs:
        pq = pr.select("id_a", "id_b")
        allp = pq if allp is None else allp.unionByName(pq)
    a = id2rep.select(F.col("id").alias("id_a"), F.col("rep").alias("ra"))
    b = id2rep.select(F.col("id").alias("id_b"), F.col("rep").alias("rb"))
    canon = (
        allp.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("ra") != F.col("rb"))
        .select(
            F.least("ra", "rb").alias("id_a"),
            F.greatest("ra", "rb").alias("id_b"),
        )
        .distinct()
    )
    clusters = dup_clusters(canon)
    return id2rep.join(
        clusters.withColumnRenamed("id", "rep"), "rep", "left"
    ).select("id", F.coalesce("cluster_id", "rep").alias("entity_id"))


def resolve_entities(
    df: DataFrame,
    id_col: str,
    record_col: str | Column,
    block_col: str | Column,
    max_distance: int = 2,
    max_block_size: int = 10_000,
) -> DataFrame:
    """One entity id per record: connected components over the blocked
    match pairs (entity_id = min member id), singletons keep their own
    id. Returns (id, entity_id).

    Pairs are VALUE-level (see :func:`blocked_link_pairs`
    ``dedup_values``): components run over distinct (record, block)
    value representatives — clique-size-independent — and every record
    then inherits its representative's entity through one value-keyed
    join. For UNCAPPED blocks the resulting partition is identical to
    record-level resolution: an identical-value clique is internally
    connected by its distance-0 in-block pairs either way, and the
    component's min id equals the min over its representatives (each
    representative is already its clique's min). When the hot-block cap
    binds the semantics intentionally differ from the pre-value-level
    behavior: ``max_block_size`` counts DISTINCT VALUES per block (a
    10×-replicated catalog no longer caps out on clique copies), and in
    a capped-out block clique members still share their representative's
    entity (identical values are always co-resolved; only cross-value
    pairing is suppressed).

    NULL-safe: records whose record or block expression is NULL keep a
    row in the output (ADVICE r09). A NULL RECORD value is a
    PER-RECORD SINGLETON (ADVICE r10 — missing data is not evidence of
    identity, and a NULL-heavy column must not fuse millions of rows
    into one entity), so such records resolve to their own id. A NULL
    BLOCK with a non-null record still collapses identical record
    values (the value itself is the identity evidence; it just never
    pairs across values, since NULL never matches the block join)."""
    from dirty_js_etl_spark.operators.dedup import dup_clusters

    rec = F.col(record_col) if isinstance(record_col, str) else record_col
    blk = F.col(block_col) if isinstance(block_col, str) else block_col
    pairs = blocked_link_pairs(
        df, id_col, record_col, block_col, max_distance, max_block_size
    )
    clusters = dup_clusters(pairs)
    recs = df.select(
        F.col(id_col).alias("id"), rec.alias("rec"), blk.alias("blk")
    )
    reps = (
        recs.filter(F.col("rec").isNotNull())
        .groupBy("rec", "blk")
        .agg(F.min("id").alias("rep"))
    )
    n, p = recs.alias("n"), reps.alias("p")
    return (
        n.join(
            p,
            (F.col("n.rec") == F.col("p.rec"))
            & F.col("n.blk").eqNullSafe(F.col("p.blk")),
            "left",
        )
        .join(
            clusters.withColumnRenamed("id", "rep"), "rep", "left"
        )
        .select(
            F.col("n.id").alias("id"),
            F.coalesce("cluster_id", "rep", F.col("n.id")).alias("entity_id"),
        )
    )
