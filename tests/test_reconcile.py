"""Replica reconciliation (operators/reconcile.py): digest parity on
identical replicas, divergence classes, and segment pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.reconcile import reconcile, segment_digests


def test_identical_replicas_diff_empty(spark, catalog):
    c = catalog.read("customer")
    assert reconcile(c, c, "c_custkey").count() == 0


def test_divergence_classes(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, v string"
    )
    b = spark.createDataFrame(
        [(1, "x"), (2, "CHANGED"), (4, "new")], "k long, v string"
    )
    got = {r["k"]: r["status"] for r in reconcile(a, b, "k").collect()}
    assert got == {2: "modified", 3: "only_left", 4: "only_right"}


def test_digest_table_bounded(spark, catalog):
    c = catalog.read("customer")
    d = segment_digests(c, "c_custkey", c.columns, n_segments=64)
    assert d.count() <= 64


def test_parity_probe_is_digest_only(spark, catalog):
    # on equal replicas the row-level diff stage receives zero rows:
    # the pruning semi-join keeps nothing because no segment disagrees
    c = catalog.read("customer")
    from dirty_js_etl_spark.operators.reconcile import segment_digests as sd

    dl, dr = sd(c, "c_custkey", c.columns), sd(c, "c_custkey", c.columns)
    unequal = (
        dl.alias("l").join(dr.alias("r"), "segment", "full")
        .filter(~(F.col("l.digest").eqNullSafe(F.col("r.digest"))))
    )
    assert unequal.count() == 0
