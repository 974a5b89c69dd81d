"""Z-order clustered write layout: files own disjoint key ranges, rows
are sorted within files, and 2-D predicates touch a bounded file subset
— the data-skipping contract write_clustered promises at scale."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.layout import write_clustered


def test_clustered_files_have_disjoint_sorted_z_ranges(spark, catalog, tmp_path):
    li = catalog.read("lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    out = str(tmp_path / "clustered")
    write_clustered(li, out, ["l_partkey", "l_suppkey"], n_files=6, bits=6)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert 1 < len(files) <= 6
    ranges = []
    total = 0
    for f in files:
        pdf = spark.read.parquet(f).select("__z").toPandas()
        if len(pdf) == 0:
            continue
        total += len(pdf)
        # sorted within the file
        assert (pdf["__z"].diff().dropna() >= 0).all(), f
        ranges.append((pdf["__z"].min(), pdf["__z"].max()))
    assert total == li.count()
    # disjoint (or boundary-touching) ranges across files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_two_dim_predicate_prunes_file_subset(spark, catalog, tmp_path):
    # a tight 2-D box in (partkey, suppkey) must map to a contiguous
    # Z-interval touching a strict subset of files — the reason to
    # Z-order instead of sorting on one column
    li = catalog.read("lineitem").select("l_partkey", "l_suppkey")
    out = str(tmp_path / "clustered2")
    write_clustered(li, out, ["l_partkey", "l_suppkey"], n_files=6, bits=6)

    full = spark.read.parquet(out)
    lo_p, hi_p = 1, 50
    lo_s, hi_s = 1, 5
    hit = full.filter(
        (F.col("l_partkey").between(lo_p, hi_p))
        & (F.col("l_suppkey").between(lo_s, hi_s))
    )
    z_lo, z_hi = (
        hit.agg(F.min("__z"), F.max("__z")).first()
        if hit.count()
        else (None, None)
    )
    assert z_lo is not None
    files_touched = {
        f
        for f in glob.glob(f"{out}/part-*.parquet")
        if not spark.read.parquet(f)
        .filter(F.col("__z").between(z_lo, z_hi))
        .isEmpty()
    }
    assert len(files_touched) < 6  # strict subset: pruning is possible
