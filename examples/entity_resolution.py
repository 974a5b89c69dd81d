"""End-to-end entity resolution over the part catalog: multi-pass
candidate generation (hash blocking + sorted neighborhood), match-graph
assembly, and a resolved-catalog summary.

Demonstrates the full linkage surface (``operators/linkage.py``):

1. PASS 1 — hash blocking: candidates only within (product noun,
   brand) blocks, pruned by in-join Levenshtein ≤ 2;
2. PASS 2 — sorted neighborhood: within the coarser brand blocks,
   records sort by their own value and pair with the next 3 — linear
   per record, catching matches pass 1's finer key split;
3. PASS 3 — LSH blocking: MinHash bands over the WHOLE record, so a
   typo in the pass-1 blocking token itself (invisible to passes 1-2)
   still buckets the pair together, Levenshtein-verified;
4. ``multi_pass_resolve`` (registered + hash-checked as x209):
   canonicalize the unioned pairs to record-value representatives,
   run connected components on the value-level union graph, re-attach
   every record null-safely, and report the duplication profile.

Usage: python examples/entity_resolution.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dirty_js_etl_spark.catalog import fixture_catalog  # noqa: E402
from dirty_js_etl_spark.operators.linkage import (  # noqa: E402
    blocked_link_pairs,
    lsh_link_pairs,
    multi_pass_resolve,
    sorted_neighborhood_pairs,
)
from dirty_js_etl_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("entity-resolution-example")
    part = fixture_catalog(spark, sf_dir).read("part")
    rec = F.concat_ws("|", "p_name", "p_type")
    fine_blk = F.concat_ws(
        "|", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)), F.col("p_brand")
    )

    t0 = time.time()
    p1 = blocked_link_pairs(part, "p_partkey", rec, fine_blk, max_distance=2)
    p2 = sorted_neighborhood_pairs(
        part, "p_partkey", rec, F.col("p_brand"), window=4, max_distance=2
    )
    p3 = lsh_link_pairs(part, "p_partkey", rec, max_distance=2)
    # canonicalizes the pair endpoints (each pass value-dedups under
    # its own keying) and resolves at the value level — the x209 shape
    resolved = multi_pass_resolve(part, "p_partkey", rec, [p1, p2, p3])

    sizes = resolved.groupBy("entity_id").agg(F.count(F.lit(1)).alias("n"))
    profile = (
        sizes.groupBy("n").agg(F.count(F.lit(1)).alias("entities"))
        .orderBy("n")
        .collect()
    )
    n_records = part.count()
    n_entities = sizes.count()
    wall = time.time() - t0
    print(f"records={n_records} entities={n_entities} "
          f"(dedup ratio {n_records / max(n_entities, 1):.3f}) in {wall:.1f}s")
    print("entity-size profile (records per entity -> entity count):")
    for r in profile:
        print(f"  {r['n']:3d} -> {r['entities']}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
