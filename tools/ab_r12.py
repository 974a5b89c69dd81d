"""Same-session alternating A/B for the two r11 watch items (VERDICT r12
task 3): the only r11 bench regressions with a code-change candidate cause
that did NOT get the x210-style isolating A/B on the record.

- **x213_t_closeness** (0.40 -> 0.81 s in the driver bench): r11 made the
  class-grid join null-safe per quasi-identifier key (eqNullSafe). Old
  spelling = the pre-r11 plain `==` join (semantically wrong on NULL keys,
  timed here purely as the perf control).
- **x5_ngram_jaccard_pairs** (1.79 -> 2.60 s): r11 reworked the shingle df
  cap to count RECORDS via a `sum(__w)` window instead of `count(1)`
  (identical output when dedup_values is off — x5's mode — since __w = 1;
  the only plan delta is the extra long column through the explode+window).

Method: both spellings are loaded from git blobs (`ba51d91^` = the last
pre-r11 commit) via importlib so the exact historical plan runs, then
ALTERNATING warm runs in one session at sf0.1 — the discipline SCALE.md
uses everywhere (interleaving cancels box-level drift, which BASELINE.md's
round-8 A/B showed can be 1.5x on this box).

Usage: python tools/ab_r12.py [reps=5] [sf_dir]
Prints one JSON line per experiment; paste the medians into SCALE.md.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dirty_js_etl_spark.session import get_spark  # noqa: E402

PRE_R11 = "ba51d91^"


def load_from_git(ref: str, path: str, name: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:{path}"],
        capture_output=True, text=True, check=True,
    ).stdout
    # the temp module file is deleted after exec (ADVICE r13: repeated
    # A/B runs were accumulating stray *_*.py files in /tmp)
    f = tempfile.NamedTemporaryFile(
        "w", suffix=".py", prefix=name + "_", delete=False
    )
    try:
        f.write(src)
        f.close()
        spec = importlib.util.spec_from_file_location(name, f.name)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        os.unlink(f.name)
    return mod


def timed(fn) -> float:
    t0 = time.perf_counter()
    n = fn().count()
    dt = time.perf_counter() - t0
    assert n >= 0
    return dt


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    spark = get_spark("ab-r12")
    old_privacy = load_from_git(
        PRE_R11, "dirty_js_etl_spark/operators/privacy.py", "old_privacy"
    )
    old_dedup = load_from_git(
        PRE_R11, "dirty_js_etl_spark/operators/dedup.py", "old_dedup"
    )
    from dirty_js_etl_spark.operators.dedup import ngram_jaccard_pairs
    from dirty_js_etl_spark.operators.privacy import t_closeness

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .withColumn(
            "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("int")
        )
        .localCheckpoint(eager=True)
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint(
        eager=True
    )

    experiments = {
        "x213_t_closeness": {
            "new_eqnullsafe": lambda: t_closeness(
                cust, ["c_nationkey", "c_mktsegment"], "bal_band",
                t_num=1, t_den=5,
            ),
            "old_plain_eq": lambda: old_privacy.t_closeness(
                cust, ["c_nationkey", "c_mktsegment"], "bal_band",
                t_num=1, t_den=5,
            ),
        },
        "x5_ngram_jaccard": {
            "new_sum_w_cap": lambda: ngram_jaccard_pairs(
                docs, "doc_id", "text", shingle_k=3, jaccard_threshold=0.5
            ),
            "old_count_cap": lambda: old_dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", shingle_k=3, jaccard_threshold=0.5
            ),
        },
    }

    for exp, variants in experiments.items():
        # warm both plans once (JVM/codegen/IO warmup outside the timing)
        for fn in variants.values():
            fn().count()
        times: dict[str, list[float]] = {k: [] for k in variants}
        for _ in range(reps):  # alternate within each rep
            for k, fn in variants.items():
                times[k].append(timed(fn))
        out = {
            "experiment": exp,
            "sf_dir": sf_dir,
            "reps": reps,
            **{
                k: {
                    "median": round(statistics.median(v), 3),
                    "runs": [round(x, 3) for x in v],
                }
                for k, v in times.items()
            },
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
