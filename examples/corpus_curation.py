"""End-to-end training-corpus curation with the round-4 operator set —
the pipeline a 100 TB pretraining-data job runs between raw documents
and training shards, composed from this engine's operators:

1. EXACT dedup (``x1``'s fingerprint groupBy) — drop byte-identical
   copies first; it is the cheapest full-corpus pass.
2. Sub-document (paragraph/chunk) dedup — strip boilerplate chunks that
   recur across the corpus, keep the first occurrence
   (``corpus.paragraph_dedup``).
3. Near-dup screening — prefix-filtered EXACT Jaccard join
   (``dedup.prefix_jaccard_pairs``, lossless) feeding connected
   components (``dedup.dup_clusters``) → keep one doc per cluster.
4. Decontamination — containment scoring against an eval set
   (``corpus.containment_scores``) plus a domain-level quality gate
   (``corpus.domain_quality``).
5. Tokenizer — BPE merges learned from the survivors
   (``bpe.learn_bpe_merges``).
6. Packing + sharding — token-budget sequence packing
   (``corpus.pack_sequences``) into token-balanced shards.

Every stage is a DataFrame transformation: at cluster scale the
intermediate relations stream between shuffles; nothing here collects
to the driver except the learned BPE merge list (one row per merge).

Run: ``python examples/corpus_curation.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dirty_js_etl_spark.catalog import fixture_catalog
from dirty_js_etl_spark.operators.bpe import apply_bpe_batched, learn_bpe_merges
from dirty_js_etl_spark.operators.corpus import (
    containment_scores,
    domain_quality,
    pack_sequences,
    paragraph_dedup,
)
from dirty_js_etl_spark.operators.dedup import (
    dedup_exact,
    dup_clusters,
    prefix_jaccard_pairs,
)
from dirty_js_etl_spark.operators.text import (
    normalize_text,
    quality_score,
    token_count,
)
from dirty_js_etl_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("corpus-curation")
    docs = fixture_catalog(spark, sf_dir).read("documents")
    n0 = docs.count()

    # 1. exact dedup: keeper = lowest doc_id per normalized fingerprint
    docs = dedup_exact(docs, F.md5(normalize_text(F.col("text"))), "doc_id")
    n1 = docs.count()

    # 2. paragraph-level dedup; drop docs whose every chunk was a dup
    paras = paragraph_dedup(docs, chunk_tokens=10)
    docs = (
        docs.join(paras.select("doc_id", "text_dedup"), "doc_id")
        .filter(F.col("text_dedup").isNotNull())
        .drop("text")
        .withColumnRenamed("text_dedup", "text")
    )
    n2 = docs.count()

    # 3. near-dup clusters at Jaccard >= 0.5, keep the smallest id
    pairs = prefix_jaccard_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    clusters = dup_clusters(pairs)  # (id, cluster_id)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(losers, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. decontaminate vs the eval split + domain-level quality gate
    eval_set = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    cont = containment_scores(train, eval_set, threshold=0.1)
    train = train.join(
        cont.filter(~F.col("flagged")).select("doc_id"), "doc_id"
    )
    gates = domain_quality(train, quality_score(F.col("text")), "source")
    good_domains = gates.filter(~F.col("below_avg")).select(
        F.col("domain").alias("source")
    )
    train = train.join(F.broadcast(good_domains), "source")
    n4 = train.count()

    # 5. learn a small BPE merge table from the survivors, then
    #    tokenize the corpus with the production (Arrow-batched) apply —
    #    the path that stays flat as the merge table grows to 30k
    merges = learn_bpe_merges(train, n_merges=8)
    merge_list = [
        (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
    ]
    train = apply_bpe_batched(train, merge_list)

    # 6. pack into 512-token training sequences per language
    packed = pack_sequences(
        train.withColumn("n_tokens", token_count(F.col("text"))),
        id_col="doc_id",
        token_count_col=F.col("n_tokens"),
        budget=512,
        group_cols=["lang"],
    )
    n_seqs = packed.select("lang", "seq_id").distinct().count()

    print(f"raw documents:            {n0}")
    print(f"after exact dedup:        {n1}")
    print(f"after paragraph dedup:    {n2}")
    print(f"after near-dup clusters:  {n3}")
    print(f"after decontam + domains: {n4}")
    print(f"learned BPE merges:       {len(merge_list)}")
    print(f"packed train sequences:   {n_seqs}")


if __name__ == "__main__":
    main(*sys.argv[1:])
