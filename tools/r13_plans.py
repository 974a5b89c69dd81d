"""Dump .explain("formatted") for headline queries to plans/r13/.

Usage: python tools/r13_plans.py SUFFIX [query ...]
Writes plans/r13/<query>_<SUFFIX>.txt for each headline query (or the
named subset). Plan-only — nothing executes. sf0.001 fixtures give the
same plan shape as sf0.1 (same schema; AQE initial plans)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dirty_js_etl_spark.queries import all_queries  # noqa: E402
from dirty_js_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    suffix = sys.argv[1]
    import bench

    qs = dict(all_queries())
    qs["x216_ingest_probe"] = bench._x216_ingest_probe
    names = sys.argv[2:] or [n for n in bench.HEADLINE if n in qs]
    spark = get_spark("r13_plans")
    if "x216_ingest_probe" in names:
        bench._prep_x216_index(
            spark, SF_DIR, bench._x216_index_dir(SF_DIR)
        )
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = qs[n](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", n)


if __name__ == "__main__":
    main()
