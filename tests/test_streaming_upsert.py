"""foreachBatch streaming upsert: the drained stream's destination must
equal the batch latest-per-user answer, including when batches split a
user's history (later batch overwrites via MERGE)."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from dirty_js_etl_spark.catalog import fixture_catalog
from dirty_js_etl_spark.streaming.upsert import run_stream_upsert

SF_DIR = "/root/testdata/sf0.001"


def _batch_latest(spark, events):
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "ts", "event_type", "value")
    )


def test_stream_upsert_matches_batch(spark):
    got = run_stream_upsert(spark, SF_DIR, query_name="t_up_single")
    want = _batch_latest(spark, fixture_catalog(spark, SF_DIR).read("events"))
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()


def test_stream_upsert_across_batches(spark, tmp_path):
    """Two ts-ordered micro-batches: users appearing in both must end at
    their batch-2 (later) row — i.e. the MERGE updated, not duplicated."""
    from dirty_js_etl_spark.streaming.upsert import StreamingUpsert, latest_per_key
    from dirty_js_etl_spark.operators.merge import MergeKey

    events = fixture_catalog(spark, SF_DIR).read("events")
    ordered = events.orderBy("ts", "event_id")
    n = ordered.count()
    first = ordered.limit(n // 2)
    second = ordered.subtract(first)

    cols = ["user_id", "ts", "event_type", "value"]
    seed = spark.createDataFrame(
        [], "user_id bigint, ts timestamp, event_type string, value double"
    )
    st = StreamingUpsert(seed, [MergeKey("user_id")])
    for batch in (first, second):
        st.apply_batch(latest_per_key(batch, "user_id", ["ts", "event_id"]).select(*cols))

    want = _batch_latest(spark, events)
    assert st.dest.exceptAll(want).isEmpty()
    assert want.exceptAll(st.dest).isEmpty()
    # one row per user, no duplicate accumulation
    assert st.dest.groupBy("user_id").count().filter("count > 1").isEmpty()
