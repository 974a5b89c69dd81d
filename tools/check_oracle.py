"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same fixture dir, then compares row count, column-name set, and
an order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding). Not the driver's exact hash — a
fast feedback loop with the same shape.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from dirty_js_etl_spark.catalog import FIXTURE_TABLES  # noqa: E402
from dirty_js_etl_spark.session import get_spark  # noqa: E402


def normalize(df_pandas):
    import pandas as pd

    pdf = df_pandas.reindex(sorted(df_pandas.columns), axis=1)

    def canon(v):
        if v is None or v != v:  # NaN/None
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    rows = sorted(tuple(canon(v) for v in row) for row in pdf.itertuples(index=False))
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = []
        if len(spark_pdf) != len(duck_pdf):
            problems.append(f"rowcount {len(spark_pdf)} != {len(duck_pdf)}")
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            problems.append(
                f"columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
            )
        if not problems:
            a, b = normalize(spark_pdf), normalize(duck_pdf)
            if a != b:
                diff = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
