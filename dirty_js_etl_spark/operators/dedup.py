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
    Docs with fewer than k words yield the whole doc as one shingle."""
    words = F.split(normalize_text(text), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
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
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified with the
    *true* shingle Jaccard. Returns (id_a, id_b, jaccard), id_a < id_b.

    Pipeline: signature projection (map-only) → explode bands → hot-bucket
    cap → bucket self-join (the one shuffle) → distinct candidate pairs →
    verify with exact Jaccard on the shingle arrays.
    """
    rows = num_perm // bands
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), num_perm, seed))

    banded = base.select(
        "id",
        F.posexplode(band_hashes(F.col("sig"), bands, rows)).alias(
            "band", "bucket"
        ),
    )
    # cap pathological buckets before the join blows up quadratically
    counts = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__n"))
    banded = (
        banded.join(counts, ["band", "bucket"])
        .filter(F.col("__n") <= max_bucket_size)
        .drop("__n")
    )

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

    a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """*Exact* n-gram-Jaccard near-dup pairs (no MinHash approximation).

    Candidates = pairs sharing >=1 shingle, found by exploding shingles
    and self-joining on the shingle hash — with a document-frequency cap
    dropping stop-shingles (a shingle in >``max_shingle_df`` docs creates
    O(df²) candidates while signaling nothing). Verification is the same
    exact Jaccard as the LSH path, so results are deterministic and
    SQL-oracle-checkable.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    exploded = base.select("id", F.explode("sh").alias("g"))
    df_counts = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    exploded = (
        exploded.join(df_counts, "g").filter(F.col("__df") <= max_shingle_df).drop("__df")
    )
    l, r = exploded.alias("l"), exploded.alias("r")
    cands = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_chunks(text: Column, n_chunks: int = 4, chunk_bits: int = 16) -> Column:
    """SimHash signature as array<int> of ``n_chunks`` × ``chunk_bits``-bit
    chunks. Per bit position: sum +1/-1 over token hashes, sign → bit.
    Pure nested array expressions (tokens → per-bit votes → chunk fold);
    map-only, codegen'd, no Python."""
    toks = F.split(normalize_text(text), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
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
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole: distance <=3 over 4 chunks forces >=1 identical chunk, so
    candidates join on (chunk_index, chunk_value) — same banded-join shape
    (and cost profile) as MinHash LSH. Returns (id_a, id_b, hamming).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        simhash_chunks(F.col(text_col), n_chunks, chunk_bits).alias("sig"),
    )
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
