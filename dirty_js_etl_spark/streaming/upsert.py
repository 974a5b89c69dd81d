"""Streaming upsert: the reference's MERGE (T5) driven by a stream via
``foreachBatch`` — the CDC-shaped composition of this engine's two
halves. Each micro-batch is reduced to one row per merge key and
upserted into the running destination with the same join-based
merge operator the batch pipeline uses.

Scale notes:

- On a real cluster the destination is a Delta/Iceberg table and the
  batch hook runs storage-native ``MERGE INTO`` (see
  ``operators.merge.merge_into_sql``); here the destination is an
  in-memory DataFrame advanced per batch.
- ``localCheckpoint(eager=True)`` after each merge materializes the new
  destination on the executors and truncates lineage — without it the
  plan tree grows by one outer join per micro-batch and planning cost
  compounds.
- Within a batch, rows are reduced per key (latest by event time) so
  the merge's unique-source-key contract (T-SQL MERGE raises on dup
  keys) holds by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.merge import MergeKey, merge_upsert


def latest_per_key(
    df: DataFrame, key: str, order_cols: list[str]
) -> DataFrame:
    """One row per key: the last row in ``order_cols`` order (the
    batch-local CDC reduction)."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


class StreamingUpsert:
    """Accumulates a destination table from a stream of upsert batches."""

    def __init__(self, dest: DataFrame, keys: list[MergeKey]):
        self.dest = dest
        self.keys = keys
        self.batches = 0

    def apply_batch(self, source: DataFrame) -> None:
        mr = merge_upsert(self.dest, source, self.keys)
        # materialize + truncate lineage: the destination must not carry
        # one join per micro-batch in its plan
        self.dest = mr.result.localCheckpoint(eager=True)
        self.batches += 1


def run_stream_upsert(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_upsert",
) -> DataFrame:
    """Drain the fixture events stream, merging each micro-batch's
    latest-per-user row into a running per-user table; returns the final
    destination (user_id, ts, event_type, value)."""
    from dirty_js_etl_spark.streaming.events import read_events_stream

    cols = ["user_id", "ts", "event_type", "value"]
    seed = spark.createDataFrame(
        [], "user_id bigint, ts timestamp, event_type string, value double"
    )
    state = StreamingUpsert(seed, [MergeKey("user_id")])

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        latest = latest_per_key(batch_df, "user_id", ["ts", "event_id"])
        state.apply_batch(latest.select(*cols))

    stream = read_events_stream(spark, sf_dir)
    q = (
        stream.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(handle)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return state.dest
