"""Idempotent foreachBatch sink (streaming/exactly_once.py): replayed
batch ids must not double-apply; distinct ids must."""

from __future__ import annotations

from dirty_js_etl_spark.streaming.exactly_once import IdempotentBatchSink


def test_redelivered_batch_noops(spark, catalog):
    target = []
    sink = IdempotentBatchSink(
        lambda df, bid: target.append((bid, df.count()))
    )
    batch = catalog.read("events").limit(100)
    sink(batch, 0)
    sink(batch, 0)  # redelivery after simulated failure
    sink(batch, 1)
    assert sink.applied == 2 and sink.skipped == 1
    assert [b for b, _ in target] == [0, 1]


def test_composes_with_streaming_upsert(spark, catalog):
    # the CDC upsert (x31's machinery) wrapped idempotently: applying
    # the same batch twice leaves the destination identical
    from dirty_js_etl_spark.operators.merge import MergeKey
    from dirty_js_etl_spark.streaming.upsert import (
        StreamingUpsert,
        latest_per_key,
    )

    seed = spark.createDataFrame(
        [], "user_id bigint, ts timestamp, event_type string, value double"
    )
    state = StreamingUpsert(seed, [MergeKey("user_id")])
    cols = ["user_id", "ts", "event_type", "value"]

    def apply(df, bid):
        state.apply_batch(latest_per_key(df, "user_id", ["ts", "event_id"]).select(*cols))

    sink = IdempotentBatchSink(apply)
    batch = catalog.read("events").filter("event_type = 'purchase'").limit(500)
    sink(batch, 7)
    after_first = sorted(map(tuple, state.dest.collect()))
    sink(batch, 7)  # replay
    assert sorted(map(tuple, state.dest.collect())) == after_first
    assert state.batches == 1
