"""Streaming deduplication — exactly-once key emission over a stream.

No reference analog (the reference is batch-only, SURVEY.md §2.3); this
is the streaming twin of ``operators/dedup.dedup_exact``: emit each key
the first time it is seen and drop every later arrival.

Scale: ``dropDuplicates`` keeps one state entry per key, partitioned by
the key hash across executors; the watermark bounds state — keys whose
event time falls behind it are expired, so state is O(keys within the
watermark horizon), not O(stream history). On a cluster the memory sink
becomes Delta/Kafka and RocksDB state store backs the key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dirty_js_etl_spark.streaming.events import read_events_stream


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "24 hours",
) -> DataFrame:
    """First-arrival-wins key dedup with bounded state. Only the key
    columns are emitted: which *copy* arrives first is a race (batch
    arrival order), the key set itself is deterministic."""
    return events.withWatermark("ts", watermark).dropDuplicates(keys).select(
        *keys
    )


def run_stream_dedup(
    spark: SparkSession,
    sf_dir: str,
    keys: list[str],
    query_name: str = "events_dedup",
) -> DataFrame:
    """Drain the finite fixture stream through the dedup operator into a
    memory sink; the result must equal the batch ``SELECT DISTINCT`` of
    the same keys (the convergence oracle)."""
    stream = read_events_stream(spark, sf_dir)
    q = (
        dedup_stream(stream, keys)
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
