"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
(north-star M4 — no reference analog; the nearest reference concept is
``forceDistinct``/T3, SURVEY.md §2.2).

Scale design (the point of each choice):

- **exact**: hash-groupBy on the dedup key — one shuffle on the md5
  fingerprint, map-side combined. At 100 TB this is the cheapest possible
  full-corpus op.
- **MinHash signatures** are computed with *array expressions only*
  (``transform`` + ``array_min`` over the shingle array): a pure
  projection, no explode, no shuffle, whole-stage codegen. The only
  shuffle in the LSH path is the band-bucket self-join — the canonical
  O(candidates) instead of O(n²) pattern.
- **ANSI-safe hashing**: Spark 4 runs with ``spark.sql.ansi.enabled=true``
  where bigint overflow *raises*; the universal-hash step reduces xxhash64
  into [0, P) first (P = 2^31-1) so ``a*h + b`` stays < 2^62.
- **hot-bucket capping**: degenerate buckets (boilerplate shingles, empty
  docs) would quadratically blow up the candidate join; buckets larger
  than ``max_bucket_size`` are dropped, matching production LSH practice.
- **SimHash**: 64-bit signature folded into four 16-bit chunks; near-dup
  candidates join on any equal chunk (pigeonhole: hamming<=3 over 64 bits
  guarantees an equal 16-bit chunk), verified with ``bit_count(xor)``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.text import normalize_text

_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime), universal-hash modulus


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact_groups(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """One row per distinct key: the kept (min) id + duplicate count.
    Single hash-shuffle on the key; partial aggregation map-side."""
    return df.groupBy(key.alias("dedup_key")).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def dedup_exact(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """The deduplicated rows themselves (keeper = lowest id per key).
    Window over the key partitioning — same single shuffle as groupBy."""
    w = Window.partitionBy(key).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams of the normalized text (array<string>).
    Docs with fewer than k words yield the whole doc as one shingle.

    Spelled as a ``zip_with`` chain over k−1 shifted slices of the word
    array rather than ``transform(idx, i -> concat_ws(slice(words, i,
    k)))``: higher-order functions evaluate interpreted (outside
    codegen), and the per-ELEMENT slice allocation made shingling the
    dominant map cost of every Jaccard pipeline (r13 microbench: 2.2×
    — 0.40 s → 0.19 s per shingle+hash pass over sf0.1 documents).
    zip_with pads the shorter side with NULL and concat_ws skips NULLs,
    so the trailing partial grams it produces are exactly the rows the
    final slice drops; output is bit-identical (diff-tested)."""
    words = F.split(normalize_text(text), " ")
    n = F.size(words)
    z = words
    for j in range(1, k):
        z = F.zip_with(
            z,
            F.slice(words, j + 1, F.greatest(n - j, F.lit(0))),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    grams = F.slice(z, 1, F.greatest(n - k + 1, F.lit(1)))
    return F.array_distinct(grams)


def char_shingles(text: Column, k: int = 3) -> Column:
    """Distinct CHARACTER k-grams of the normalized text
    (array<string>). The right shingle granularity for SHORT records
    (linkage descriptors, titles, names): a record of w words carries
    only w-k+1 word shingles — for the 2-3 word records of a product
    catalog that is ONE shingle, so any two distinct values have
    Jaccard 0 and LSH can never bucket them. Character grams give
    length-k+1 shingles; a single-character typo in an n-char record
    kills ≤ k of them (J ≈ (n-2k)/n). Strings shorter than k yield
    themselves as one shingle."""
    t = normalize_text(text)
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: t.substr(i, F.lit(k)))
    return F.array_distinct(grams)


def _hash_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    h_i(x) = (a_i * x + b_i) mod P — generated driver-side, embedded as
    literals (the plan is identical on every executor)."""
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(num_perm)]


def minhash_signature(
    shingles: Column, num_perm: int = 64, seed: int = 42
) -> Column:
    """MinHash signature (array<int> of length num_perm) as a pure
    projection: xxhash64 each shingle, reduce into [0,P), then per
    permutation take ``array_min`` of ``(a*h + b) mod P``. No explode, no
    shuffle — signatures for 100 TB of docs are a map-only stage."""
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_P)))
    mins = [
        F.array_min(
            F.transform(base, lambda h: F.pmod(a * h + b, F.lit(_P)))
        ).cast("int")
        for a, b in _hash_params(num_perm, seed)
    ]
    return F.array(*mins)


def _signature_from_hashed(
    exploded: DataFrame, num_perm: int, seed: int
) -> DataFrame:
    """(id, m0..) signature agg over an already-exploded ``(id, g)``
    frame of raw xxhash64 shingle hashes. Set sizes no longer ride this
    shuffle: verify is array-based (round 8) and reads ``F.size`` off
    the checkpointed hashed arrays instead."""
    h = F.pmod(F.col("g"), F.lit(_P))
    aggs = [
        F.min(F.pmod(a * h + b, F.lit(_P))).cast("int").alias(f"m{i}")
        for i, (a, b) in enumerate(_hash_params(num_perm, seed))
    ]
    return exploded.groupBy("id").agg(*aggs)


def minhash_signature_table(
    sh_base: DataFrame, num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """(id, m0..m{num_perm-1}) signature table via explode + hash-agg.

    The array-expression form (:func:`minhash_signature`) builds
    ``num_perm`` nested higher-order functions, which Spark evaluates
    *interpreted* (HOFs are outside whole-stage codegen) — measurably
    slow at even 5k docs. Exploding the hashed shingles once and taking
    ``min((a_i*h+b_i) mod P)`` per permutation keeps every expression
    codegen'd; the map-side partial min means the single shuffle carries
    one 64-int row per doc per partition. Same values as the array form.
    """
    exploded = sh_base.select(
        "id",
        F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("g"),
    )
    return _signature_from_hashed(exploded, num_perm, seed)


def band_hashes(sig: Column, bands: int, rows: int) -> Column:
    """Fold the signature into ``bands`` bucket hashes (array<bigint>):
    bucket_j = xxhash64 of the j-th r-row slice rendered as a string."""
    return F.array(
        *[
            F.xxhash64(F.concat_ws("_", F.slice(sig, j * rows + 1, rows)))
            for j in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    max_bucket_size: int = 1000,
    hash_fn: Callable[[Column], Column] | None = None,
    portable_bands: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified with the
    *true* shingle Jaccard. Returns (id_a, id_b, jaccard), id_a < id_b.

    Pipeline: signature projection (map-only) → explode bands → hot-bucket
    cap → bucket self-join (the one shuffle) → distinct candidate pairs →
    verify with exact Jaccard on the shingle arrays.

    ``hash_fn`` swaps the shingle hash (default xxhash64; pass
    :func:`portable_token_hash60` for an oracle-recomputable pipeline)
    and ``portable_bands=True`` buckets each band on the md5-derived
    60-bit hash instead of xxhash64 so the band join, the hot-bucket
    cap, and therefore the exact candidate set are engine-portable too.
    """
    rows = num_perm // bands
    sh_base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    # Hashed-shingle ARRAYS — one (id, array<bigint>) row per doc,
    # materialized once. Shingling (lower/split/k-gram concat/distinct)
    # is the pipeline's real CPU cost (~5 s of x6's sf1 wall measured
    # serially), and both downstream consumers — the signature agg and
    # the array verify — need the same hashed sets; checkpointing the
    # packed arrays (≈ posting-row bytes, but one row per doc) makes
    # it run exactly once. Shingles are array_distinct so the array
    # length IS the set size (modulo a 2^-64 xxhash collision).
    # GC-scoped localCheckpoint, LAZY (r14 job-floor audit): the FIRST
    # consumer is sig_tbl's EAGER build below — a single sequential job
    # in which this frame appears once, so it materializes (and
    # persists) inside that job instead of paying its own blocking
    # job first. The later verify-join consumers read the persisted
    # blocks. The VERDICT r04 #8 lazy-checkpoint race (concurrent
    # stages both computing an unmaterialized frame, spraying
    # cancelled-task noise) cannot happen here because sig_tbl's eager
    # build completes before any concurrent consumer launches.
    hashed = sh_base.select(
        "id",
        F.transform("sh", hash_fn or (lambda s: F.xxhash64(s))).alias("ga"),
    ).localCheckpoint(eager=False)
    exploded = hashed.select("id", F.explode("ga").alias("g"))
    # codegen-friendly signature table (see minhash_signature_table);
    # band j buckets on the hash of its contiguous r-column slice.
    # Also materialized — one 64-int row per doc (the smallest relation
    # in the pipeline), and the banded frame below fans out to three
    # consumers (bucket counts, join left/right) that would each replay
    # the signature aggregation otherwise.
    sig_tbl = _signature_from_hashed(exploded, num_perm, seed).localCheckpoint(
        eager=True
    )

    def _bucket(cols):
        joined = F.concat_ws("_", *cols)
        if portable_bands:
            return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast(
                "bigint"
            )
        return F.xxhash64(joined)

    buckets = F.array(
        *[
            _bucket([F.col(f"m{j * rows + i}") for i in range(rows)])
            for j in range(bands)
        ]
    )
    banded = sig_tbl.select(
        "id", F.posexplode(buckets).alias("band", "bucket")
    )
    # cap pathological buckets before the join blows up quadratically
    counts = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__n"))
    banded = (
        banded.join(counts, ["band", "bucket"])
        .filter(F.col("__n") <= max_bucket_size)
        .drop("__n")
    )

    # NO pinned spread on the band self-join (r14, VERDICT r13 task 4):
    # the r13 both-sided REPARTITION_BY_NUM pin was re-measured in an
    # interleaved kill-switch ABAB at sf0.1 in quiet windows — spread ON
    # 3.26-3.89 s vs OFF 2.56-3.20 s, consistent across both pairs; the
    # driver's r13 read (x6 3.04 → 3.74, −19%) was a real regression,
    # not noise. Unlike the linkage enumerators (broadcast build side,
    # probe partitioning free), this self-join's two pinned exchanges
    # replaced ENSURE_REQUIREMENTS exchanges AQE was already placing on
    # the same keys, so they bought no parallelism and cost two extra
    # pinned stages. AQE's byte-coalescing of the banded table is
    # bounded here by the bucket cap + distinct-pair dedup downstream.
    left = banded.alias("l")
    right = banded.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )

    # array-based exact verify: each candidate pair pulls the two
    # hashed-shingle ARRAYS (two id-keyed joins) and intersects them
    # map-side (``array_intersect`` — O(|A|+|B|) hash-set probe inside
    # codegen). This replaced the count-based posting join (round 8):
    # that shape exploded every candidate against its full posting
    # list and re-shuffled the corpus-scale posting table on (id, g) —
    # at sf1 the verify stage alone was 8.9 s of x6's 14 s; the array
    # table is one row per doc (the corpus's own scale, ~8·|shingles|
    # bytes per row) and the per-pair work is candidate-cardinality.
    # jaccard = inter / (|A| + |B| - inter).
    #
    # No broadcast hints anywhere in the verify stage: the candidate
    # set and the array table are both corpus-cardinality relations on
    # a near-dup-heavy corpus, and a forced broadcast of either is an
    # OOM at 100 TB. These are plain shuffle joins; AQE converts them
    # to broadcasts at runtime when the actual size is small (the
    # sf0.01 test case), which is the only time a broadcast is safe.
    verified = (
        cands.join(
            hashed.select(
                F.col("id").alias("id_a"), F.col("ga").alias("__gaa")
            ),
            "id_a",
        )
        .join(
            hashed.select(
                F.col("id").alias("id_b"), F.col("ga").alias("__gab")
            ),
            "id_b",
        )
        .withColumn("__inter", F.size(F.array_intersect("__gaa", "__gab")))
        .withColumn(
            "jaccard",
            # RAW integer-count ratio — one IEEE division of values both
            # engines materialize identically, so it hashes identically
            # everywhere. NO decimal re-round: Spark's F.round (HALF_UP
            # on the shortest decimal repr) and DuckDB's round (binary
            # half-away) disagree on ratios like 41/640 = 0.0640625
            # (tools/round_audit.py scan: 93 such p/q with q<=20000 at
            # scale 6) — the kmv_estimate discipline, VERDICT r12 task 3.
            F.col("__inter")
            / (F.size("__gaa") + F.size("__gab") - F.col("__inter")),
        )
    )
    return verified.filter(
        F.col("jaccard") >= jaccard_threshold
    ).select("id_a", "id_b", "jaccard")


def _count_based_verify(
    cands: DataFrame,
    posts_a: DataFrame,
    posts_b: DataFrame,
    sizes_a: DataFrame,
    sizes_b: DataFrame,
    jaccard_threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs from narrow
    ``(id, g)`` posting rows: intersections arrive as (id_a, id_b,
    count) — shingle arrays never ship. Shared by the self-join LSH
    path (both posting frames identical) and the incremental
    batch-vs-corpus path (distinct frames). No broadcast hints: all
    relations are data-scaled; AQE broadcasts at runtime when small.

    The per-doc sizes attach to the CANDIDATE pairs (pair-cardinality —
    the same two joins the old shape spent on the intersection output)
    and gate them with the size-ratio prefilter
    ``min(|A|,|B|) ≥ τ·max(|A|,|B|)`` — necessary for ``J ≥ τ`` — so a
    size-incompatible candidate never reaches the posting-list join,
    the expensive stage it would otherwise cost O(|A|) rows in
    (VERDICT r07 task 5). Sizes then ride the posting join as two ints
    and come out through the pair groupBy's keys."""
    # prefilters admit against τ - 5e-7, not τ: the emitted contract is
    # round(jaccard, 6) >= τ, so a pair with true J in [τ-5e-7, τ) that
    # rounds up must never be pruned before the verify (ADVICE r08)
    tau_pre = max(jaccard_threshold - 5e-7, 0.0)
    sa = sizes_a.select(F.col("id").alias("id_a"), F.col("sz").alias("__sza"))
    sb = sizes_b.select(F.col("id").alias("id_b"), F.col("sz").alias("__szb"))
    cands = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.least(F.col("__sza"), F.col("__szb"))
            >= tau_pre * F.greatest(F.col("__sza"), F.col("__szb"))
        )
    )
    ea = posts_a.join(
        cands, F.col("id") == F.col("id_a")
    ).select("id_a", "id_b", "__sza", "__szb", "g")
    inter = (
        ea.alias("ea")
        .join(
            posts_b.alias("eb"),
            (F.col("eb.id") == F.col("ea.id_b"))
            & (F.col("eb.g") == F.col("ea.g")),
        )
        .groupBy("ea.id_a", "ea.id_b", "ea.__sza", "ea.__szb")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            # raw integer-count ratio, no decimal re-round (the kmv
            # discipline — see the array-verify path's note)
            F.col("__inter")
            / (F.col("__sza") + F.col("__szb") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    max_shingle_df: int = 1000,
    prefix_l: int = 3,
    dedup_values: bool = False,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs, count-based (no MinHash).

    Explode shingles (hashed to 64-bit ints so shuffle rows are narrow),
    drop stop-shingles above the document-frequency cap (a shingle in
    >``max_shingle_df`` docs creates O(df²) candidates while signaling
    nothing), self-join on the shingle hash and COUNT matches per pair:
    ``|A∩B|`` arrives from the same shuffle that found the candidates.
    Intersection counts use capped shingles; sizes are uncapped full
    shingle counts (the operational near-dup contract: stop-shingles
    can't *create* a pair but still count toward its union).

    Candidate generation is a LOSSLESS extended prefix filter (the
    PPJoin family's l-prefix scheme), which collapsed the sf1 pair-join
    output from 86M rows to ~16M and the candidate set to ~0.5M
    (VERDICT r07 task 2 — x5 was 25% of the sf1 wall):

    - shingles sort per doc by the global (document-frequency, hash)
      order — rarest first — and only the first
      ``szc − ⌈τ·sz⌉ + prefix_l`` generate candidate rows. For a
      qualifying pair the required overlap is
      α(A,B) = ⌈τ/(1+τ)·(|A|+|B|)⌉ and a valid partner has |B| ≥ τ|A|,
      so α ≥ ⌈τ·|A|⌉ per doc; the l-prefix theorem then guarantees
      ≥ min(prefix_l, ⌈α(A,B)⌉) shared tokens inside these prefixes, so
      the pair filter requires exactly that count — the old ≥2 filter
      with its small-pair relaxation is the prefix_l=2 special case.
      Measured at sf1: prefix_l=3 cuts surviving candidates 1.53M→305k
      (true pairs: 250.6k) for one extra posting row per doc, the best
      wall time of l∈{2,3,4} (8.5 s vs 9.8/9.3 s);
    - every prefilter admits against τ_pre = τ − 5e-7 rather than τ:
      the emitted contract is ``round(jaccard, 6) ≥ τ``, so a pair
      whose true J lies in [τ−5e-7, τ) and rounds up survives the
      screens and reaches the verify (ADVICE r08);
    - the size-ratio prefilter ``min ≥ τ·max`` (necessary for J ≥ τ)
      rides the prefix join condition;
    - surviving candidates verify by exact hashed-set intersection
      (``array_intersect`` on the capped per-doc arrays, built in the
      same groupBy that forms the prefixes) — candidate-cardinality
      work, no corpus-scale posting join;
    - ``dedup_values`` (default False; r10): the dedup-then-pair option
      for EXACT-duplicate-heavy corpora (the r9 linkage lesson —
      scraped training corpora routinely carry big identical-text
      cliques, and record-level pairing is O(clique²) inside them).
      Identical normalized texts collapse to a min-id representative
      (md5 value key, one narrow (id, key) shuffle — text never
      shuffles), the whole shingle/prefix/verify pipeline runs on
      DISTINCT values only, and pairs re-expand through the clique map
      at output cardinality. Cross-value member pairs inherit the
      value pair's jaccard verbatim (identical shingle sets);
      same-value member pairs get J = szc/(2·sz − szc) — exactly what
      the record-level pipeline computes for an identical pair under
      the capped-intersection / uncapped-size contract (and exactly no
      pair when no shingle survives the cap, szc = 0, matching the
      shared-surviving-token requirement). The emitted pair set is
      IDENTICAL either way — including when the df cap binds: the
      representative carries its clique size into the shingle pipeline
      as a weight, so document frequency counts RECORDS (Σ clique
      sizes), exactly what the record-level path counts (ADVICE r10;
      hypothesis-property-tested against the brute force with a
      binding cap). Only the work moves from clique-quadratic to
      value-level + output-cardinality. Default OFF because on a
      LOW-exact-dup corpus (the fixtures: sf1 documents are 99.8%
      distinct texts — their near-dup pairs are perturbed variants,
      not clique members) the three extra materializations and
      expansion joins are pure overhead (~2× at sf0.1); flip it on
      when exact-dup mass is expected — it composes with, not
      replaces, the upstream exact-dedup pass.
    """
    from pyspark.sql import Window

    from dirty_js_etl_spark.operators.text import normalize_text

    tau = jaccard_threshold
    if dedup_values:
        # narrow clique shuffle: only (id, 128-bit value key) rows move;
        # the representative's TEXT is fetched by one id-keyed join
        # (AQE broadcasts the value table when small), never shuffled
        # for the whole corpus. members / reps / mem are each consumed
        # by several expansion joins, so they materialize once
        # (GC-scoped eager localCheckpoints of narrow tables).
        members = df.select(
            F.col(id_col).alias("id"),
            F.md5(normalize_text(F.col(text_col))).alias("vk"),
        ).localCheckpoint(eager=True)
        reps = (
            members.groupBy("vk")
            .agg(F.min("id").alias("rep"), F.count(F.lit(1)).alias("__c"))
            .localCheckpoint(eager=True)
        )
        # the representative carries its clique size __c so the df cap
        # stays RECORD-level: a shingle's document frequency must count
        # every record (sum of clique sizes), not distinct values —
        # otherwise, on exactly the exact-dup-heavy corpora this flag
        # targets, the two modes would cap different shingles and emit
        # different pairs (ADVICE r10)
        rep_docs = df.select(
            F.col(id_col).alias("id"),
            normalize_text(F.col(text_col)).alias("nt"),
        ).join(reps.select(F.col("rep").alias("id"), "__c"), "id")
        vpairs, sizes = _ngram_pairs_core(
            rep_docs, "id", "nt", shingle_k, tau, max_shingle_df, prefix_l,
            weight_col="__c",
        )
        repmap = reps.select("rep", "vk", "__c")
        mem = (
            members.join(reps.select("vk", "rep"), "vk")
            .select("id", "rep")
            .localCheckpoint(eager=True)
        )
        ma = mem.select(F.col("rep").alias("id_a"), F.col("id").alias("__ia"))
        mb = mem.select(F.col("rep").alias("id_b"), F.col("id").alias("__ib"))
        cross = (
            vpairs.join(ma, "id_a")
            .join(mb, "id_b")
            .select(
                F.least("__ia", "__ib").alias("id_a"),
                F.greatest("__ia", "__ib").alias("id_b"),
                "jaccard",
            )
        )
        intra_q = (
            repmap.filter(F.col("__c") > 1)
            .join(sizes, "rep")
            .filter(F.col("szc") > 0)
            .withColumn(
                "jaccard",
                # raw integer-count ratio, no decimal re-round (kmv
                # discipline)
                F.col("szc") / (2 * F.col("sz") - F.col("szc")),
            )
            .filter(F.col("jaccard") >= tau)
            .select("vk", "jaccard")
        )
        intra = (
            intra_q.join(
                members.select("vk", F.col("id").alias("id_a")), "vk"
            )
            .join(members.select("vk", F.col("id").alias("id_b")), "vk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "jaccard")
        )
        return cross.unionByName(intra)
    pairs, _ = _ngram_pairs_core(
        df, id_col, text_col, shingle_k, tau, max_shingle_df, prefix_l
    )
    return pairs


def _ngram_pairs_core(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    jaccard_threshold: float,
    max_shingle_df: int,
    prefix_l: int,
    weight_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The record-level prefix-filtered pipeline. Returns
    (pairs (id_a, id_b, jaccard), sizes (rep, sz, szc)) — sizes come
    off the already-checkpointed array table for the value-level
    wrapper's intra-clique jaccard. ``weight_col`` (a long column on
    ``df``, default 1/row) weights each doc's contribution to the
    per-shingle document frequency — the value-level wrapper passes
    clique sizes so the df cap binds on RECORD-level counts."""
    from pyspark.sql import Window

    w_expr = F.col(weight_col) if weight_col else F.lit(1)
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
        w_expr.cast("long").alias("__w"),
    )
    exploded = base.select(
        "id",
        F.size("sh").alias("sz"),  # shingles are array_distinct → set size
        "__w",
        F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("g"),
    )
    # document frequency per shingle as ONE window over the posting
    # table (r10): the previous shape — a groupBy(g) aggregate joined
    # back onto the postings — shuffled the corpus-scale posting rows
    # TWICE (once map-side-combined for the counts, once full for the
    # sort-merge cap join) and needed an eager localCheckpoint because
    # exploded had two consumers replaying the scan+shingle lineage
    # (31 s vs 11 s at sf1 without it). count(*) OVER (PARTITION BY g)
    # computes the same uncapped df in the single g-keyed shuffle the
    # join's probe side paid anyway, the lineage is linear (one
    # consumer — no checkpoint, no second scan), and the per-shingle
    # partitions a window must buffer are exactly the df counts the
    # cap is about to bound (a hot stop-shingle buffers at most its
    # posting list, the same rows the old join shuffled to one reducer).
    capped = exploded.withColumn(
        "__df", F.sum("__w").over(Window.partitionBy("g"))
    ).filter(F.col("__df") <= max_shingle_df)
    # one shuffle by id builds both the global-order arrays (verify
    # side) and the prefixes (candidate side); sort_array on
    # struct(df, g) is the rarest-first total order
    arr = (
        capped.groupBy("id", "sz")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__df", "g"))),
                lambda s: s["g"],
            ).alias("ga")
        )
        .localCheckpoint(eager=True)
    )
    # prefilters run against τ_pre = τ - 5e-7, not τ: the emitted
    # contract is round(jaccard, 6) >= τ, so a pair whose true J lies in
    # [τ-5e-7, τ) and rounds up must survive every prefilter and reach
    # the verify (ADVICE r08). τ_pre is smaller, so every use below is
    # monotone-safe: longer prefixes, weaker size/positional/count
    # screens — never a lost qualifying pair.
    tau_pre = max(jaccard_threshold - 5e-7, 0.0)
    # α underestimates shave with a 1e-9 epsilon: a too-small α only
    # lengthens the prefix (safe); a float overshoot would truncate it
    prefix_len = F.greatest(
        F.size("ga")
        - F.ceil(F.lit(tau_pre) * F.col("sz") - F.lit(1e-9)).cast("int")
        + F.lit(prefix_l),
        F.lit(0),
    )
    prefix = arr.select(
        "id",
        "sz",
        F.size("ga").alias("szc"),
        F.posexplode(F.slice("ga", F.lit(1), prefix_len)).alias("pos", "g"),
    )
    l, r = prefix.alias("l"), prefix.alias("r")
    # positional filter (PPJoin): a token matching at 0-based positions
    # (p_l, p_r) of the sorted capped arrays bounds the total overlap by
    # min(p_l, p_r) + min(szc_a - p_l, szc_b - p_r) — common tokens
    # strictly before it plus those from it onward. For a qualifying
    # pair EVERY genuinely shared token satisfies this with the true
    # α(A,B) = τ/(1+τ)·(|A|+|B|), so dropping rows below the bound
    # never starves the ≥2 count filter; it prunes inside the join,
    # before rows reach the pair aggregation.
    overlap_ub = F.least(F.col("l.pos"), F.col("r.pos")) + F.least(
        F.col("l.szc") - F.col("l.pos"), F.col("r.szc") - F.col("r.pos")
    )
    alpha = (
        F.lit(tau_pre / (1.0 + tau_pre))
        * (F.col("l.sz") + F.col("r.sz"))
        - F.lit(1e-9)
    )
    cands = (
        l.join(
            r,
            (F.col("l.g") == F.col("r.g"))
            & (F.col("l.id") < F.col("r.id"))
            & (
                F.least(F.col("l.sz"), F.col("r.sz"))
                >= tau_pre * F.greatest(F.col("l.sz"), F.col("r.sz"))
            )
            & (overlap_ub >= alpha),
        )
        .groupBy(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sz").alias("__sza"),
            F.col("r.sz").alias("__szb"),
        )
        .agg(F.count(F.lit(1)).alias("__pref"))
        # the l-prefix guarantee, per pair: a qualifying pair shares at
        # least min(l, ⌈α(A,B)⌉) tokens inside the l-extended prefixes.
        # Proof shape (sorted-set prefix theorem): with per-doc prefix
        # |X| − ⌈τ·|X|⌉ + l, shared tokens past the shorter prefix's
        # last element number ≤ max(⌈τ·max(|A|,|B|)⌉ − l, 0), and
        # ⌈τ·max⌉ ≤ ⌈α(A,B)⌉ under the size-ratio screen, so the
        # prefix-shared count is ≥ min(l, ⌈α(A,B)⌉) exactly — the ≥1
        # small-pair relaxation of the old l=2 shape falls out as the
        # α(A,B)=1 case rather than a special branch.
        .filter(
            F.col("__pref")
            >= F.least(
                F.lit(prefix_l),
                F.ceil(
                    F.lit(tau_pre / (1.0 + tau_pre))
                    * (F.col("__sza") + F.col("__szb"))
                    - F.lit(1e-9)
                ),
            )
        )
    )
    verified = (
        cands.join(
            arr.select(F.col("id").alias("id_a"), F.col("ga").alias("__gaa")),
            "id_a",
        )
        .join(
            arr.select(F.col("id").alias("id_b"), F.col("ga").alias("__gab")),
            "id_b",
        )
        .withColumn(
            "__inter", F.size(F.array_intersect("__gaa", "__gab"))
        )
    )
    pairs = (
        verified.withColumn(
            "jaccard",
            # raw integer-count ratio, no decimal re-round (kmv
            # discipline)
            F.col("__inter")
            / (F.col("__sza") + F.col("__szb") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    sizes = arr.select(
        F.col("id").alias("rep"), "sz", F.size("ga").alias("szc")
    )
    return pairs, sizes


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def _components_single_task(
    edges: DataFrame, id_type, _inject_failure: bool = False
) -> DataFrame:
    """Union-find connected components in ONE executor task (not the
    driver) — the small-graph physical strategy of :func:`dup_clusters`.
    ``edges`` is the bidirectional (src, dst) table, so ``src`` covers
    every node. Union-by-min-root makes each component's root its
    minimum member id — bit-identical output to the converged min-label
    propagation. One job, zero iterative scheduling."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("id", id_type), StructField("cluster_id", id_type)]
    )

    def uf(pdf):
        import pandas as pd

        if _inject_failure:  # test hook: a REAL in-task failure, so the
            # fallback is exercised through Spark's task-failure path
            raise RuntimeError("injected union-find task failure (test)")

        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            rs, rd = find(s), find(d)
            if rs == rd:
                continue
            if rd < rs:
                rs, rd = rd, rs
            parent[rd] = rs  # larger root under smaller: root = min id

        ids = pdf["src"].drop_duplicates().tolist()
        return pd.DataFrame(
            {"id": ids, "cluster_id": [find(i) for i in ids]}
        )

    return edges.groupBy(F.lit(1).alias("__g")).applyInPandas(
        lambda pdf: uf(pdf), schema
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    small_graph_edges: int = 1_000_000,
    _inject_single_task_failure: bool = False,
) -> DataFrame:
    """Connected components over near-dup pairs: (id, cluster_id) with
    cluster_id = min member id — the keep-one-per-cluster dedup step
    (SURVEY.md §7.1: shingle → minhash → band → pairs → components).

    Min-label propagation with pointer jumping: each round every node
    takes the minimum label over its neighborhood, then adopts its
    label's own label (path halving) — convergence in O(log diameter)
    rounds, so even pathological duplicate chains finish fast. Each
    round is two key-joins + a min-agg; labels are checkpointed per
    round so the plan does not grow. Raises if ``max_iterations``
    rounds don't converge.

    Physical strategy is SIZE-ADAPTIVE (r11, the broadcast-vs-shuffle
    analog for iterative graph work): the edge table is materialized
    first (it is needed either way), and when it holds at most
    ``small_graph_edges`` rows — the common case, since every upstream
    candidate generator caps its blocks/bands — components run as a
    single-task union-find (:func:`_components_single_task`): ONE job
    instead of O(log d) iterations of join+checkpoint+check jobs whose
    cost on a small match graph is pure scheduler floor (x209's
    component stage was ~5 s of job floor for a 4.4k-edge graph at
    sf0.1). The default threshold is sized to the single task's MEMORY,
    not to when the distributed loop gets competitive: 1M bidirectional
    edges is a ~16 MB Arrow batch plus a Python dict union-find of at
    most 1M entries (~100 B+/entry ≈ 100 MB) — comfortable inside a
    default executor, where a 5M default could straggle or OOM right at
    the threshold. Above the threshold the distributed min-label loop
    runs unchanged — at 100 TB a pair graph can be billions of edges (the
    caps bound per-block work, not the total), and nothing here ever
    collects to the driver. The single-task path is materialized eagerly
    and FALLS BACK to the distributed loop on task failure (a 1M-edge
    graph with pathological node count can still OOM one executor; the
    fallback recovers instead of failing the query). Output is
    bit-identical either way
    (union-by-min-root ≡ converged min-label propagation; both label a
    component by its minimum member id). Per-round cost of the big-path
    loop is one checkpoint job plus one bounded scan: the old-vs-new
    comparison rides the checkpointed frame as a ``__chg`` flag, so the
    convergence check is a filter over in-memory blocks, not a third
    join.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # LAZY + count (r14 job-floor audit): the strategy-pick count
        # below is the first consumer, so it materializes the
        # checkpoint inside its own job — one blocking job instead of
        # the former eager-build-then-count two. No concurrent-consumer
        # race: everything after the count reads persisted blocks.
        .localCheckpoint(eager=False)
    )
    # bounded job over the checkpointed blocks — the strategy pick
    if edges.count() <= small_graph_edges:
        # The single task is materialized HERE (eager localCheckpoint):
        # a pathological graph right at the edge threshold (1M edges but
        # high node count / long chains) can still OOM one executor, and
        # a lazy return would surface that failure downstream, inside
        # whatever action consumes the clusters. Materializing bounds
        # the failure to this call so it can FALL BACK to the
        # distributed min-label loop instead of failing the query
        # (VERDICT r12 task 5). Output is bit-identical either way, so
        # the fallback is invisible except in the log.
        try:
            return _components_single_task(
                edges,
                pairs.schema[id_a].dataType,
                _inject_failure=_inject_single_task_failure,
            ).localCheckpoint(eager=True)
        except Exception:  # Py4JJavaError etc. — task/executor failure
            import logging

            logging.getLogger(__name__).warning(
                "dup_clusters: single-task union-find failed; falling "
                "back to the distributed min-label loop"
            )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # candidate label for each node: min over neighbors' labels
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr, labels["id"] == nbr["src"], "left").select(
            "id",
            F.col("label").alias("__old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: adopt the label of your label (path halving)
        parent = labels.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(parent, stepped["label"] == parent["pid"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
                (
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("plabel"), F.col("label")),
                    )
                    != F.col("__old")
                ).alias("__chg"),
            )
            # lazy (r14 job-floor audit): the convergence probe below is
            # the first consumer and runs sequentially, so it
            # materializes the round's frame inside its own job — one
            # blocking job per round instead of two. (The initial
            # ``labels`` checkpoint above stays EAGER: it feeds three
            # concurrent stages of the round job, the r04 lazy-race.)
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("__chg")).limit(1).count()
        labels = new_labels.select("id", "label")
        if not changed:
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iterations} iterations"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def portable_token_hash60(t: Column) -> Column:
    """60-bit token hash BOTH engines compute identically: the first 15
    hex chars of md5 as a positive bigint (the x96 cross-engine idiom —
    DuckDB spells it ``CAST('0x' || substring(md5(t), 1, 15) AS
    BIGINT)``). Slower than xxhash64 but lets a simhash signature be
    recomputed exactly by an ANSI-SQL oracle."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")


def simhash_chunks(
    text: Column,
    n_chunks: int = 4,
    chunk_bits: int = 16,
    hash_fn: Callable[[Column], Column] | None = None,
) -> Column:
    """SimHash signature as array<int> of ``n_chunks`` × ``chunk_bits``-bit
    chunks. Per bit position: sum +1/-1 over token hashes, sign → bit.
    Pure nested array expressions (tokens → per-bit votes → chunk fold);
    map-only, codegen'd, no Python. ``hash_fn`` swaps the token hash
    (default xxhash64 — fastest; :func:`portable_token_hash60` makes the
    signature oracle-recomputable, needing ``n_chunks*chunk_bits <= 60``)."""
    toks = F.split(normalize_text(text), " ")
    hashes = F.transform(toks, hash_fn or (lambda t: F.xxhash64(t)))
    chunks = []
    for c in range(n_chunks):
        bits = []
        for i in range(chunk_bits):
            bit = c * chunk_bits + i
            vote = F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.getbit(h, F.lit(bit)) == 1, F.lit(1)).otherwise(F.lit(-1)),
            )
            bits.append(F.when(vote > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        chunk = bits[0]
        for b in bits[1:]:
            chunk = chunk + b
        chunks.append(chunk)
    return F.array(*chunks)


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two chunked signatures."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
    chunk_bits: int = 16,
    max_bucket_size: int = 1000,
    hash_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole: distance <=3 over 4 chunks forces >=1 identical chunk, so
    candidates join on (chunk_index, chunk_value) — same banded-join shape
    (and cost profile) as MinHash LSH. Returns (id_a, id_b, hamming).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        simhash_chunks(
            F.col(text_col), n_chunks, chunk_bits, hash_fn
        ).alias("sig"),
    )
    return chunked_signature_pairs(base, max_hamming, max_bucket_size)


def chunked_signature_pairs(
    base: DataFrame,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Pigeonhole hamming-pair join over ANY chunked signature table
    ``(id, sig: array<int>)`` — shared by SimHash text near-dup and the
    multimodal perceptual-hash near-dup (``multimodal.py``). With ``c``
    chunks, any pair at distance <= c-1 shares >= 1 identical chunk, so
    candidates reduce to an equi-join on (chunk_index, chunk_value);
    hot buckets (a degenerate constant signature) are capped at
    ``max_bucket_size`` like the LSH band join. Returns
    ``(id_a, id_b, hamming)``.
    """
    banded = base.select(
        "id", "sig", F.posexplode("sig").alias("chunk_idx", "chunk_val")
    )
    counts = banded.groupBy("chunk_idx", "chunk_val").agg(
        F.count(F.lit(1)).alias("__n")
    )
    banded = (
        banded.join(counts, ["chunk_idx", "chunk_val"])
        .filter(F.col("__n") <= max_bucket_size)
        .drop("__n")
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            simhash_hamming(F.col("l.sig"), F.col("r.sig")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# fuzzy (edit-distance) matching + cluster canonicalization
# ---------------------------------------------------------------------------


def fuzzy_blocked_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_distance: int = 3,
) -> DataFrame:
    """Edit-distance near-dup pairs with blocking: the self-join only
    compares rows sharing every ``block_cols`` value, then keeps pairs
    with ``levenshtein(text) <= max_distance``.

    Scale design: levenshtein is O(len^2) per pair, so the blocking keys
    carry all the scale-out — the equi-join shuffles once on the block
    key and each bucket is quadratic only in its own size. Pick blocks
    bounded in cardinality (brand x size here, not e.g. language). The
    ``id < id`` predicate halves the candidate set and dedups (a,b)/(b,a).
    """
    cols = [id_col, text_col, *block_cols]
    l = df.select(cols).alias("l")
    r = df.select(cols).alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    for b in block_cols:
        cond = cond & (F.col(f"l.{b}") == F.col(f"r.{b}"))
    dist = F.levenshtein(F.col(f"l.{text_col}"), F.col(f"r.{text_col}"))
    return (
        l.join(r, cond)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            dist.alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )


def cluster_canonical(
    clusters: DataFrame,
    scored: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Pick one canonical representative per duplicate cluster: the
    highest-``score_col`` member (ties -> lowest id), plus the member
    count — the "which copy do we keep" step after ``dup_clusters``.

    One broadcast-sized join (clusters are a projection of the pair
    graph, tiny next to the corpus) then a single window shuffle on
    cluster_id."""
    joined = clusters.join(
        scored.select(F.col(id_col).alias("id"), F.col(score_col)), "id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col("id")
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_docs", F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
        )
        .filter(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col("id").alias("canonical_id"),
            F.col(score_col),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


def incremental_dedup(
    new_batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Daily-ingest dedup: keep only new-batch docs that are exact
    duplicates of NEITHER the already-curated corpus NOR an earlier
    (smaller-id) doc in the same batch. Returns ``(id, fp)``.

    This is the incremental complement of :func:`exact_dedup` — a
    pipeline never re-deduplicates 100 TB of history to admit a day's
    ingest; it screens the delta against the corpus fingerprint set.

    Scale: both relations project to narrow ``(id?, fp)`` rows before
    touching a shuffle (column-pruned scans). The within-batch winner
    is an fp-keyed window; the corpus screen is a plain shuffle
    LEFT ANTI on fp — deliberately NO broadcast hint, because both
    sides are data-scaled (the corpus always, the batch on heavy
    ingest days); AQE chooses a runtime broadcast when the batch is
    actually small. In storage terms the corpus side reads one
    column; with the fingerprint persisted as a corpus column (the
    exact_dedup output schema), the scan is index-shaped.
    """
    fp = F.md5(normalize_text(F.col(text_col)))
    new_fp = new_batch.select(F.col(id_col), fp.alias("fp"))
    corpus_fp = corpus.select(fp.alias("fp")).distinct()
    w = Window.partitionBy("fp").orderBy(id_col)
    first_in_batch = (
        new_fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return first_in_batch.join(corpus_fp, "fp", "left_anti").select(
        id_col, "fp"
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via prefix filtering (AllPairs /
    PPJoin family — Bayardo et al., WWW 2007): the lossless counterpart
    of :func:`ngram_jaccard_pairs`'s df-cap heuristic.

    Order every doc's shingles globally by (document frequency, hash) —
    rarest first — and index only each doc's PREFIX: the first
    ``|d| - ceil(t·|d|) + 1`` shingles. Any pair with Jaccard >= t must
    share at least one prefix shingle (if all shared shingles sat
    outside both prefixes, the intersection would be too small to reach
    t), so the candidate self-join runs on the prefix postings — a
    t-proportional fraction of the full posting list, with the HOTTEST
    (high-df) shingles preferentially excluded, which is where the df²
    join blowup lives. Candidates are then verified with an exact
    intersection count (two candidate-driven joins against the full
    postings), so the result is bit-identical to the uncapped
    brute-force pair join — which is literally the oracle.

    Scale profile: one shingle shuffle (df counts), one id-keyed window
    (prefix ranks), the prefix self-join (the pruned quadratic term),
    and a candidate-sized verification join. No broadcasts of anything
    corpus-scaled; skew is governed by the highest df INSIDE a prefix,
    which prefix ordering actively minimizes.
    """
    t = jaccard_threshold
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    # eager for the same mid-job-materialization reason as
    # minhash_lsh_pairs (VERDICT r04 #8); sizes derive from the hash
    # counts (distinct shingles) instead of re-shingling the corpus
    exploded = base.select(
        "id", F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("g")
    ).localCheckpoint(eager=True)
    sizes = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    df_counts = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("id").orderBy(F.asc("__df"), F.asc("g"))
    prefix = (
        exploded.join(df_counts, "g")
        .withColumn("__pos", F.row_number().over(w))
        .join(sizes, "id")
        .filter(
            F.col("__pos")
            <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
        )
        .select("id", "g")
    )
    l, r = prefix.alias("l"), prefix.alias("r")
    cand = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    pa = exploded.select(F.col("id").alias("id_a"), "g")
    pb = exploded.select(F.col("id").alias("id_b"), "g")
    inter = (
        cand.join(pa, "id_a")
        .join(pb, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("__sza"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("__szb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            # raw integer-count ratio, no decimal re-round (kmv
            # discipline)
            F.col("__inter")
            / (F.col("__sza") + F.col("__szb") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    hash_fn: Callable[[Column], Column] | None = None,
    portable_bands: bool = False,
    shingler: Callable[[Column, int], Column] = word_shingles,
) -> DataFrame:
    """``(id, band, bucket)`` LSH index rows for a corpus — the table a
    production pipeline PERSISTS as its near-dup index (partitioned by
    band/bucket) so daily ingests join against it instead of
    recomputing corpus signatures. Same signature/banding parameters
    must be used on both sides of any later join (seed included).

    ``hash_fn``/``portable_bands`` mirror :func:`minhash_lsh_pairs`:
    the defaults are the xxhash64 fast path; passing
    :func:`portable_token_hash60` + ``portable_bands=True`` makes the
    whole index recomputable by an external SQL engine. ``shingler``
    picks the shingle granularity — :func:`word_shingles` (documents)
    or :func:`char_shingles` (short records, where word grams collapse
    to one shingle and distinct values can never collide)."""
    rows = num_perm // bands
    sh_base = df.select(
        F.col(id_col).alias("id"),
        shingler(F.col(text_col), shingle_k).alias("sh"),
    )
    exploded = sh_base.select(
        "id",
        F.explode(
            F.transform("sh", hash_fn or (lambda s: F.xxhash64(s)))
        ).alias("g"),
    )
    sig_tbl = _signature_from_hashed(exploded, num_perm, seed)

    def _bucket(cols):
        joined = F.concat_ws("_", *cols)
        if portable_bands:
            return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast(
                "bigint"
            )
        return F.xxhash64(joined)

    buckets = F.array(
        *[
            _bucket([F.col(f"m{j * rows + i}") for i in range(rows)])
            for j in range(bands)
        ]
    )
    return sig_tbl.select("id", F.posexplode(buckets).alias("band", "bucket"))


def incremental_minhash_pairs(
    new_batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    max_bucket_size: int = 1000,
    hash_fn: Callable[[Column], Column] | None = None,
    portable_bands: bool = False,
) -> DataFrame:
    """Near-dup screen of a NEW batch against an already-curated corpus
    plus within-batch pairs — the MinHash complement of
    :func:`incremental_dedup` (exact fingerprints). Returns
    ``(id_a, id_b, jaccard, against)`` where ``against`` is
    ``'corpus'`` (id_a = batch doc, id_b = corpus doc) or ``'batch'``
    (both new, id_a < id_b).

    The corpus×corpus join NEVER happens: candidates come from the
    batch's band buckets probing the corpus band table (in production a
    persisted index — :func:`minhash_band_table` — so the corpus side
    is a partitioned read, not a recompute; here it is derived on the
    fly from the corpus frame). Join cost scales with batch size ×
    bucket hit rate, not corpus²; this is how a 100 TB curated corpus
    admits a daily delta. Caller guarantees disjoint id spaces.
    """
    nb = minhash_band_table(
        new_batch, id_col, text_col, shingle_k, num_perm, bands, seed,
        hash_fn=hash_fn, portable_bands=portable_bands,
    )
    cb = minhash_band_table(
        corpus, id_col, text_col, shingle_k, num_perm, bands, seed,
        hash_fn=hash_fn, portable_bands=portable_bands,
    )
    # cap pathological buckets by their CORPUS population (the side
    # that can be huge); the batch side additionally self-caps below
    c_counts = cb.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("__n")
    )
    cb = (
        cb.join(c_counts, ["band", "bucket"])
        .filter(F.col("__n") <= max_bucket_size)
        .drop("__n")
    )

    def shingle_frames(df):
        sh = df.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), shingle_k).alias("sh"),
        )
        posts = sh.select(
            "id",
            F.explode(
                F.transform("sh", hash_fn or (lambda s: F.xxhash64(s)))
            ).alias("g"),
        )
        return posts, sh.select("id", F.size("sh").alias("sz"))

    new_posts, new_sizes = shingle_frames(new_batch)
    cor_posts, cor_sizes = shingle_frames(corpus)

    cross_cands = (
        nb.alias("l")
        .join(
            cb.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    cross = _count_based_verify(
        cross_cands, new_posts, cor_posts, new_sizes, cor_sizes,
        jaccard_threshold,
    ).withColumn("against", F.lit("corpus"))

    n_counts = nb.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("__n")
    )
    nb_capped = (
        nb.join(n_counts, ["band", "bucket"])
        .filter(F.col("__n") <= max_bucket_size)
        .drop("__n")
    )
    within_cands = (
        nb_capped.alias("l")
        .join(
            nb_capped.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    within = _count_based_verify(
        within_cands, new_posts, new_posts, new_sizes, new_sizes,
        jaccard_threshold,
    ).withColumn("against", F.lit("batch"))
    return cross.unionByName(within)


# ---------------------------------------------------------------------------
# incremental near-dup: probe a persisted LSH index with a daily ingest
# ---------------------------------------------------------------------------


class NearDupIndex(NamedTuple):
    """The three tables a production pipeline PERSISTS (partitioned by
    band/bucket resp. bucketed by id) so daily ingests never touch the
    corpus text again: the hot-bucket-capped band index, the per-doc
    shingle-hash posting table (the verify side), and the per-doc
    shingle-set sizes. Built once by :func:`build_near_dup_index`;
    every probe (:func:`probe_near_dup_index`) is ingest-sized."""

    band_index: DataFrame  # (old_id, band, bucket), cap already applied
    hashed: DataFrame      # (old_id, h) corpus shingle hashes
    sizes: DataFrame       # (old_id, szc)


def build_near_dup_index(
    corpus_docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_bucket_size: int = 1000,
    hash_fn: Callable[[Column], Column] | None = None,
    portable_bands: bool = False,
) -> NearDupIndex:
    """Build the persisted near-dup index for a curated corpus — the
    ONCE-per-corpus half of :func:`incremental_near_dup`. The hot-bucket
    cap is applied HERE, at index build (a degenerate corpus bucket
    would otherwise make every future probe quadratic); the posting and
    size tables serve the exact-Jaccard verify so probes never re-read
    corpus text. At 100 TB the band index is bands × corpus narrow rows
    and the posting table is one long per shingle — both a small
    fraction of the text they index, written once, read per-ingest."""
    hf = hash_fn or (lambda c: F.xxhash64(c))
    idx = minhash_band_table(
        corpus_docs, id_col, text_col, shingle_k=shingle_k,
        num_perm=num_perm, bands=bands, seed=seed, hash_fn=hash_fn,
        portable_bands=portable_bands,
    )
    ok = (
        idx.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket_size)
        .select("band", "bucket")
    )
    kept = idx.join(ok, ["band", "bucket"]).withColumnRenamed("id", "old_id")
    hc = corpus_docs.select(
        F.col(id_col).alias("old_id"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("g"),
    ).select("old_id", hf(F.col("g")).alias("h"))
    szc = hc.groupBy("old_id").agg(F.count(F.lit(1)).alias("szc"))
    return NearDupIndex(band_index=kept, hashed=hc, sizes=szc)


def probe_near_dup_index(
    new_docs: DataFrame,
    index: NearDupIndex,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    hash_fn: Callable[[Column], Column] | None = None,
    portable_bands: bool = False,
    max_candidates_per_probe: int | None = None,
) -> DataFrame:
    """The PER-INGEST half of :func:`incremental_near_dup`: band the new
    batch with the same seeded signature family, probe the persisted
    index with one band+bucket equi-join, and pay the exact
    hashed-shingle Jaccard verify only on surviving candidates. All
    signature parameters (shingle_k/num_perm/bands/seed/hash_fn) MUST
    match the index build. Cost is ingest-sized banding + a probe join
    whose corpus side is index rows + candidate-cardinality verify
    joins — never corpus-pairs-sized. Output contract is identical to
    :func:`incremental_near_dup` (one argmax decision row per matched
    new doc).

    ``max_candidates_per_probe`` (opt-in, VERDICT r12 task 2) bounds
    the verify cost per ingest doc in duplicate-dense corpora: when a
    new doc's buckets hold many corpus docs (e.g. a template with
    hundreds of legitimate near-copies), only the top-m candidates by
    BAND-AGREEMENT COUNT (the number of bands in which the pair
    co-bucketed — a monotone proxy for signature similarity, hence for
    Jaccard; ties → min old_id) proceed to the exact verify. The argmax
    decision is preserved whenever the true best co-buckets in at least
    as many bands as the m-th candidate — for an exact or near-exact
    dup that is ALL bands, so the cap cannot evict it
    (``test_probe_candidate_cap_keeps_argmax``). Candidate counts on
    the uniform fixtures stay tiny (p99 = 2 at sf0.1); the knob exists
    for the duplicate-dense regime, measured in SCALE.md r13."""
    from pyspark.sql import Window

    hf = hash_fn or (lambda c: F.xxhash64(c))
    probe = minhash_band_table(
        new_docs, id_col, text_col, shingle_k=shingle_k,
        num_perm=num_perm, bands=bands, seed=seed, hash_fn=hash_fn,
        portable_bands=portable_bands,
    ).withColumnRenamed("id", "new_id")
    if max_candidates_per_probe is None:
        cands = (
            probe.join(index.band_index, ["band", "bucket"])
            .select("new_id", "old_id")
            .distinct()
        )
    else:
        # same shuffle shape as the .distinct() spelling (one agg keyed
        # on the pair), plus a per-new_id window whose partitions are
        # bounded by bands × index-side bucket cap
        agree = (
            probe.join(index.band_index, ["band", "bucket"])
            .groupBy("new_id", "old_id")
            .agg(F.count(F.lit(1)).alias("__bands"))
        )
        wc = Window.partitionBy("new_id").orderBy(
            F.col("__bands").desc(), F.col("old_id")
        )
        cands = (
            agree.withColumn("__crn", F.row_number().over(wc))
            .filter(F.col("__crn") <= max_candidates_per_probe)
            .select("new_id", "old_id")
        )
    hn = new_docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("g"),
    ).select("id", hf(F.col("g")).alias("h"))
    szn = hn.groupBy("id").agg(F.count(F.lit(1)).alias("szn"))
    # candidate-cardinality verify: both joins are equi-keyed on
    # (doc id, shingle hash) — the x6b intersection-count shape
    hn2 = hn.select(F.col("id").alias("new_id"), F.col("h").alias("ha"))
    hc2 = index.hashed.select(
        F.col("old_id").alias("__oid"), F.col("h").alias("hb")
    )
    inter = (
        cands.join(hn2, "new_id")
        .join(
            hc2,
            (F.col("old_id") == F.col("__oid"))
            & (F.col("ha") == F.col("hb")),
        )
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    scored = (
        inter.join(szn.withColumnRenamed("id", "new_id"), "new_id")
        .join(index.sizes, "old_id")
        .withColumn(
            "jaccard",
            # raw integer-count ratio, no decimal re-round (kmv
            # discipline)
            F.col("__i") / (F.col("szn") + F.col("szc") - F.col("__i")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    w = Window.partitionBy("new_id").orderBy(
        F.col("jaccard").desc(), F.col("old_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("new_id", F.col("old_id").alias("dup_of"), "jaccard")
    )


def incremental_near_dup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    max_bucket_size: int = 1000,
    hash_fn: Callable[[Column], Column] | None = None,
    portable_bands: bool = False,
) -> DataFrame:
    """The DAILY-INGEST near-dup path: check new documents against an
    EXISTING corpus without recomputing corpus pairs. The corpus's
    ``(id, band, bucket)`` table (:func:`minhash_band_table`) is the
    persisted index a production pipeline keeps partitioned by
    (band, bucket); the ingest batch bands itself with the same
    signature parameters, probes the index with ONE band+bucket
    equi-join, and only the surviving candidates pay the exact
    hashed-shingle Jaccard verify. Emits one decision row per matched
    new doc: ``(new_id, dup_of, jaccard)`` with ``dup_of`` the
    argmax-jaccard corpus doc (ties → min id) at
    ``round(j, 6) >= jaccard_threshold``. New-vs-new duplicates inside
    the ingest batch are a separate :func:`minhash_lsh_pairs` run —
    this operator is the index-probe path.

    Scale: the corpus is scanned to (re)build the index here for
    self-containment; in production the index is READ, so per-ingest
    cost is ingest-sized banding + a probe join whose corpus side is
    index rows (bands × corpus, narrow), + candidate-cardinality
    verify joins. The hot-bucket cap applies on the INDEX side (a
    degenerate corpus bucket would make every probe quadratic — cap at
    index build, exactly like the self-join pipelines). With
    ``portable_token_hash60`` + ``portable_bands=True`` every stage is
    ANSI-SQL-replayable (the x6b idiom), including the argmax: jaccards
    are bit-identical, so the (jaccard DESC, id) rank order is too.

    This is exactly :func:`build_near_dup_index` composed with
    :func:`probe_near_dup_index` — kept as one self-contained call so
    the driver's oracle can replay corpus + ingest from the same raw
    table; production (and ``bench.py``'s probe-only entry) uses the
    two halves so the index is built once and every ingest pays only
    the probe."""
    index = build_near_dup_index(
        corpus_docs, id_col, text_col, shingle_k=shingle_k,
        num_perm=num_perm, bands=bands, seed=seed,
        max_bucket_size=max_bucket_size, hash_fn=hash_fn,
        portable_bands=portable_bands,
    )
    return probe_near_dup_index(
        new_docs, index, id_col, text_col, shingle_k=shingle_k,
        num_perm=num_perm, bands=bands,
        jaccard_threshold=jaccard_threshold, seed=seed, hash_fn=hash_fn,
        portable_bands=portable_bands,
    )
