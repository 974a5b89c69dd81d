"""x216 probe-candidate growth measurement (VERDICT r12 task 2 residue,
r14 task 9): how many index candidates a daily-ingest probe generates
per document as the corpus scales, and what the opt-in
``max_candidates_per_probe`` cap would do at each scale.

For each fixture dir given, rebuilds the x216 corpus index (exactly the
registry query's parameters), bands the ingest batch, joins
batch-bands × index-bands (the probe's candidate stage BEFORE
verification), and reports the per-probe-doc candidate distribution:
count of probed docs, total candidate (batch_doc, corpus_doc) pairs,
mean / p50 / p90 / max candidates per batch doc — the growth curve
SCALE.md needs to justify the cap's default-off setting.

Usage: python tools/r14_x216_candidates.py /root/testdata/sf0.01 \
           /root/testdata/sf0.1 .sf1_testdata
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dirty_js_etl_spark.operators.dedup import (  # noqa: E402
    build_near_dup_index,
    minhash_band_table,
    portable_token_hash60,
)
from dirty_js_etl_spark.session import get_spark  # noqa: E402


def measure(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    ingest = docs.filter(F.col("doc_id") % 5 == 0)
    idx = build_near_dup_index(
        corpus, "doc_id", "text", num_perm=32, bands=8,
        hash_fn=portable_token_hash60, portable_bands=True,
    )
    probe_bands = minhash_band_table(
        ingest, "doc_id", "text", num_perm=32, bands=8,
        hash_fn=portable_token_hash60, portable_bands=True,
    )
    # the probe's candidate stage: batch band rows joined to index band
    # rows, distinct (batch, corpus) pairs — exactly what the verify
    # stage must score, and what max_candidates_per_probe would cap
    cands = (
        probe_bands.alias("p")
        .join(
            idx.band_index.alias("i"),
            (F.col("p.band") == F.col("i.band"))
            & (F.col("p.bucket") == F.col("i.bucket")),
        )
        .select(
            F.col("p.id").alias("new_id"), F.col("i.id").alias("corpus_id")
        )
        .distinct()
    )
    per_doc = cands.groupBy("new_id").agg(F.count(F.lit(1)).alias("n"))
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("docs_with_cands"),
        F.sum("n").alias("total_cands"),
        F.avg("n").alias("mean"),
        F.expr("percentile(n, 0.5)").alias("p50"),
        F.expr("percentile(n, 0.9)").alias("p90"),
        F.max("n").alias("max"),
    ).collect()[0]
    return {
        "sf_dir": sf_dir,
        "corpus_docs": corpus.count(),
        "ingest_docs": ingest.count(),
        "docs_with_candidates": stats["docs_with_cands"],
        "total_candidate_pairs": stats["total_cands"],
        "mean_per_doc": round(float(stats["mean"]), 2),
        "p50_per_doc": float(stats["p50"]),
        "p90_per_doc": float(stats["p90"]),
        "max_per_doc": stats["max"],
    }


def main() -> None:
    spark = get_spark("x216_candidates")
    for sf_dir in sys.argv[1:]:
        print(json.dumps(measure(spark, sf_dir)))


if __name__ == "__main__":
    main()
