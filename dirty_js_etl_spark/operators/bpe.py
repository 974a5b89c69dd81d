"""Distributed BPE merge learning (Sennrich et al., ACL 2016) — the
tokenizer-training step of an LLM data pipeline, expressed as DataFrame
aggregations (north-star extension; the reference,
`bruslim/dirty-js-etl`, has no text surface at all — SURVEY.md §2.3).

Shape of the computation, per merge iteration:

1. pair counting: explode each word's adjacent symbol pairs, weighted
   by corpus word frequency → one narrow hash aggregation;
2. argmax: the single best pair (max count, lexicographic tie-break)
   via a k=1 TakeOrdered — ONE row to the driver per iteration (the
   learned merge itself — irreducible driver traffic);
3. apply: greedy left-to-right merge of that pair inside every word's
   symbol array — a pure ``F.aggregate`` fold, JVM-side, map-only.

Scale design: everything operates on the WORD-FREQUENCY relation
(distinct words + counts), not the corpus — the standard trick that
makes BPE tractable: 100 TB of text folds to O(100M) distinct words in
one shuffle, and iterations never touch the corpus again. Each
iteration then costs one narrow pair-count shuffle over the vocab
relation. Lineage is truncated with a lazy localCheckpoint every few
merges so the plan does not grow linearly with merge count. This
per-iteration-job formulation is honest about its regime: fine for
hundreds of merges (data-engine territory); a production 30k-merge
tokenizer run samples the word table down first (the operator composes
with weighted_sample/stratified_sample for exactly that) or switches to
a single-node incremental-heap trainer over the REDUCED word table —
which at ~100M rows fits one beefy node; the distributed win here is
the 100 TB → word-table reduction and the per-merge scans staying in
Spark when the vocab table itself is too big to ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.text import normalize_text

_EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus → ``(word, freq)``: the one corpus-wide shuffle."""
    words = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    return (
        df.select(words.alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Word → array of single-character symbols + terminal marker."""
    chars = F.split(word, "")
    # Spark's split("abc", "") yields ["a","b","c"] (no trailing empty)
    return F.concat(chars, F.array(F.lit(_EOW)))


def _merge_fold(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) → a+b inside one
    symbol array — a pure ``aggregate`` fold with (out, pending) state,
    whole-stage-codegen'd, no UDF. Matches classic BPE apply semantics
    (e.g. pair (x,x) over [x,x,x] → [xx, x])."""
    merged = F.lit(a + b)
    out_t = "array<string>"

    def step(acc, x):
        flush = F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))
        return F.when(
            acc["pend"].eqNullSafe(F.lit(a)) & (x == F.lit(b)),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ),
        ).otherwise(
            F.struct(flush.alias("out"), x.alias("pend"))
        )

    init = F.struct(
        F.array().cast(out_t).alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )
    return F.aggregate(
        symbols,
        init,
        step,
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the weighted vocab: explode
    ``zip(symbols, symbols[1:])`` → one hash aggregation."""
    pairs = F.zip_with(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def learn_bpe_merges(
    corpus: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table as a DataFrame ``(rank, left, right, merged, pair_count)`` —
    fully deterministic (integer counts, lexicographic tie-break), so
    two runs on the same corpus produce identical tables regardless of
    partitioning.
    """
    spark = corpus.sparkSession
    vocab = word_frequencies(corpus, text_col).select(
        _initial_symbols(F.col("word")).alias("symbols"), "freq"
    )
    rows = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["pair_count"]
        rows.append((rank, a, b, a + b, cnt))
        vocab = vocab.select(
            _merge_fold(F.col("symbols"), a, b).alias("symbols"), "freq"
        )
        if (rank + 1) % checkpoint_every == 0:
            # truncate the per-iteration fold lineage; lazy -> blocks
            # are GC-released with the frame (no session-pinned cache)
            vocab = vocab.localCheckpoint(eager=False)
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count long"
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, apply
    each merge in rank order (the standard apply loop, unrolled into a
    chain of JVM folds — fine for the modest merge counts this trainer
    targets). Adds ``bpe_tokens array<string>``."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    tok = F.transform(words, lambda w: _initial_symbols(w))

    def merge_word(sym):
        out = sym
        for a, b in merges:
            out = _merge_fold(out, a, b)
        return out

    return df.withColumn(
        "bpe_tokens", F.flatten(F.transform(tok, merge_word))
    )
