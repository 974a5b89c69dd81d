"""Time-series grid fill (operators/timeseries.py) + streaming dedup
(streaming/dedup.py) semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.timeseries import hourly_grid_fill

SF_DIR = "/root/testdata/sf0.001"


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_grid_fill_carries_forward(spark):
    events = spark.createDataFrame(
        [
            (1, 7, _ts(0, 10), 1.0),
            (2, 7, _ts(0, 50), 2.0),  # later in hour 0 wins
            (3, 7, _ts(3, 0), 9.0),  # hours 1-2 are gaps
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    rows = {
        (r["user_id"], r["hour"].hour): r["filled_value"]
        for r in hourly_grid_fill(events).collect()
    }
    assert rows == {(7, 0): 2.0, (7, 1): 2.0, (7, 2): 2.0, (7, 3): 9.0}


def test_grid_fill_span_and_density(spark, catalog):
    events = catalog.read("events")
    out = hourly_grid_fill(events)
    # grid rows = sum over users of (span hours + 1); filled everywhere
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("filled_value").isNull().cast("int")).alias("nulls"),
    )
    assert per_user.filter(F.col("nulls") > 0).count() == 0
    bounds = events.groupBy("user_id").agg(
        (
            (
                F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
            )
            / 3600
            + 1
        ).alias("expect")
    )
    joined = per_user.join(bounds, "user_id")
    assert joined.filter(F.col("n") != F.col("expect")).count() == 0


def test_streaming_dedup_matches_batch_distinct(spark):
    from dirty_js_etl_spark.streaming.dedup import run_stream_dedup

    got = run_stream_dedup(
        spark, SF_DIR, ["user_id", "event_type"], query_name="dedup_ut"
    )
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
