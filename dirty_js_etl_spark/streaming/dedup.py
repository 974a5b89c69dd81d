"""Streaming deduplication — exactly-once key emission over a stream.

No reference analog (the reference is batch-only, SURVEY.md §2.3); this
is the streaming twin of ``operators/dedup.dedup_exact``: emit each key
the first time it is seen and drop every later arrival.

Scale: ``dropDuplicatesWithinWatermark`` keeps one state entry per key,
partitioned by the key hash across executors, and EVICTS entries whose
event time falls behind the watermark — state is O(keys within the
watermark horizon), not O(stream history). Plain ``dropDuplicates``
would only expire state if the event-time column itself were part of
the dedup key (it is not — the whole point is deduping across time), so
its state grows forever: the classic streaming-dedup OOM. The horizon
is the dedup contract: duplicates farther apart than it re-emit; pick
it from the duplicate-arrival SLA, not the stream length. On a cluster
the memory sink becomes Delta/Kafka and RocksDB backs the key state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dirty_js_etl_spark.streaming.events import read_events_stream


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "24 hours",
) -> DataFrame:
    """First-arrival-wins key dedup with watermark-bounded state. Only
    the key columns are emitted: which *copy* arrives first is a race
    (batch arrival order), the key set itself is deterministic within
    the watermark horizon."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def run_stream_dedup(
    spark: SparkSession,
    sf_dir: str,
    keys: list[str],
    query_name: str = "events_dedup",
    watermark: str = "90 days",
) -> DataFrame:
    """Drain the finite fixture stream through the dedup operator into a
    memory sink; the result must equal the batch ``SELECT DISTINCT`` of
    the same keys (the convergence oracle). The horizon here exceeds the
    fixture's full time span — the convergence check needs every
    duplicate inside ONE horizon; production callers pick the SLA-sized
    horizon that bounds their state instead."""
    stream = read_events_stream(spark, sf_dir)
    q = (
        dedup_stream(stream, keys, watermark=watermark)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
