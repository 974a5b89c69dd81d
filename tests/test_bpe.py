"""Distributed BPE merge learning (operators/bpe.py): hand-computed
merge table on the classic toy corpus, partition-invariance, and
apply/train consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.bpe import (
    apply_bpe,
    learn_bpe_merges,
    word_frequencies,
)


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [(1, "low low low lower lower newest newest newest newest widest")],
        "doc_id long, text string",
    )


def test_merge_table_hand_computed(spark, toy):
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in learn_bpe_merges(toy, 3).orderBy("rank").collect()
    ]
    # we: 4 (newest) + 2 (lower) = 6; then lo: 5, st: 5 (lexicographic
    # l < s tie-break)
    assert got == [
        (0, "w", "e", "we", 6),
        (1, "l", "o", "lo", 5),
        (2, "s", "t", "st", 5),
    ]


def test_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, "some words repeat some words here") for i in range(20)],
        "doc_id long, text string",
    )
    a = learn_bpe_merges(docs, 6).collect()
    b = learn_bpe_merges(docs.repartition(7), 6).collect()
    assert a == b


def test_apply_preserves_characters(spark, toy):
    merges = [
        (r["left"], r["right"])
        for r in learn_bpe_merges(toy, 5).orderBy("rank").collect()
    ]
    out = apply_bpe(toy, merges).select("bpe_tokens").collect()[0][0]
    # merging never creates or destroys characters: stripping the
    # end-of-word markers reconstructs the normalized text
    rebuilt = "".join(t.replace("</w>", " ") for t in out).strip()
    assert rebuilt == "low low low lower lower newest newest newest newest widest"


def test_word_frequencies_one_row_per_word(spark, toy):
    wf = {r["word"]: r["freq"] for r in word_frequencies(toy).collect()}
    assert wf == {"low": 3, "lower": 2, "newest": 4, "widest": 1}


def test_greedy_fold_overlapping_pair(spark):
    # classic edge: pair (a,a) over "aaa" merges left-to-right -> [aa, a]
    docs = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    m = learn_bpe_merges(docs, 1).collect()
    assert (m[0]["left"], m[0]["right"]) == ("a", "a")
    out = apply_bpe(docs, [("a", "a")]).select("bpe_tokens").collect()[0][0]
    assert out == ["aa", "a", "</w>"]
