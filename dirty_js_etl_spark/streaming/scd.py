"""Streaming SCD type-2 maintenance: ``foreachBatch`` applies each
micro-batch of changes to a running version-history table, converging to
the batch :func:`~dirty_js_etl_spark.operators.scd.scd2_history` answer.

This is the warehouse-standard CDC shape (reference analog: the T5
MERGE keeps only latest-per-key; SCD2 keeps every version — see
``operators/scd.py``), lifted to a stream: per batch,

1. chain the batch's own changes with the batch-local SCD2 window
   (one shuffle keyed by entity, batch-sized);
2. close the history's open row for every key seen in the batch
   (``valid_to`` := the key's first batch timestamp);
3. shift the batch chain's version numbers by the key's previous open
   version and append.

In-order contract: per key, changes must arrive in non-decreasing
``ts`` order across batches (the Kafka-partition-per-key guarantee CDC
pipelines rely on); within a batch, ``tie_break`` disambiguates
simultaneous changes. Out-of-order arrivals would interleave validity
intervals — that regime needs the full batch rebuild (x44) or a
retract-and-reapply per affected key.

Scale notes: steps 1–3 are joins keyed by the entity key against the
BATCH's key set only (the history side prunes via the join), so
per-batch cost tracks batch size, not history size, on a storage layer
with key-clustered files (Delta/Iceberg MERGE INTO — the rendered
``merge_into_sql`` seam). Here the history is an in-memory DataFrame
advanced with an eager ``localCheckpoint`` per batch (lineage must not
grow by three joins per micro-batch); blocks are GC-released with the
frame, never session-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.scd import scd2_history


class StreamingScd2:
    """Accumulates an SCD2 history table from ordered change batches."""

    def __init__(
        self,
        key_col: str,
        ts_col: str,
        value_cols: list[str],
        tie_break: str | None = None,
    ):
        self.key_col = key_col
        self.ts_col = ts_col
        self.value_cols = value_cols
        self.tie_break = tie_break
        self.history: DataFrame | None = None
        self.batches = 0

    def apply_batch(self, batch: DataFrame) -> None:
        if batch.isEmpty():
            return
        k = self.key_col
        chain = scd2_history(
            batch, k, self.ts_col, self.value_cols, self.tie_break
        )
        if self.history is None:
            new_hist = chain
        else:
            firsts = chain.filter(F.col("version") == 1).select(
                F.col(k), F.col("valid_from").alias("__first_ts")
            )
            closed = (
                self.history.join(firsts, k, "left")
                .withColumn(
                    "valid_to",
                    F.when(
                        F.col("is_current") & F.col("__first_ts").isNotNull(),
                        F.col("__first_ts"),
                    ).otherwise(F.col("valid_to")),
                )
                .withColumn(
                    "is_current",
                    F.col("is_current") & F.col("__first_ts").isNull(),
                )
                .drop("__first_ts")
            )
            # the open row per key IS the key's max version
            open_v = self.history.filter(F.col("is_current")).select(
                F.col(k), F.col("version").alias("__base")
            )
            shifted = (
                chain.join(open_v, k, "left")
                .withColumn(
                    "version",
                    F.col("version") + F.coalesce(F.col("__base"), F.lit(0)),
                )
                .drop("__base")
            )
            new_hist = closed.unionByName(shifted)
        self.history = new_hist.localCheckpoint(eager=True)
        self.batches += 1


def run_stream_scd2(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_scd2",
) -> DataFrame:
    """Drain the fixture events stream, maintaining the purchase-stream
    SCD2 history incrementally; returns the final history (same schema
    and — given in-order arrival — same rows as batch x44)."""
    from dirty_js_etl_spark.streaming.events import read_events_stream

    state = StreamingScd2(
        key_col="user_id",
        ts_col="ts",
        value_cols=["value"],
        tie_break="event_id",
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        state.apply_batch(
            batch_df.filter(F.col("event_type") == "purchase").select(
                "user_id", "ts", "value", "event_id"
            )
        )

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
    hist = state.history
    assert hist is not None, "stream produced no purchase batches"
    return hist.select(
        "user_id", "value", "valid_from", "valid_to",
        F.col("version").cast("long").alias("version"), "is_current",
    )
