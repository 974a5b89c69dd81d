"""Streaming count-min sketch: per-micro-batch frequency grids merged
into a running sketch via ``foreachBatch`` — the streaming face of
``operators/sketch.py``'s CMS and the demonstration of WHY mergeable
sketches matter in a pipeline: the stream never re-reads history; each
batch contributes a bounded ``depth × width`` grid and the merge is a
cell-wise sum, so the running state is constant-size no matter how much
data has flowed (contrast stateful distinct counting, whose state grows
with cardinality).

Because cell-wise merge is exactly associative over integer counts, the
drained stream's grid is bit-identical to a one-shot batch build over
the same rows — which is what lets the driver hash-check a *streaming
sketch* against a plain SQL oracle (x150): the oracle rebuilds the same
grid from the portable md5 buckets and must land on the same estimates.

Scale notes:

- Per batch: one narrow aggregation (explode depth rows/key → partial
  agg caps each partition's shuffle at depth×width rows).
- The running grid is ≤ depth×width rows; ``localCheckpoint(eager)``
  after each merge truncates lineage (same pattern as streaming/
  upsert.py — without it the plan grows one union per micro-batch).
- On a real cluster the grid lives in a Delta/Iceberg table and the
  batch hook MERGEs on (row, bucket); here it is an in-memory frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.sketch import cms_estimate, cms_sketch


class StreamingCms:
    """Accumulates a CMS grid from a stream of (key, count) batches."""

    def __init__(self, spark: SparkSession, depth: int, width: int):
        self.depth = depth
        self.width = width
        self.grid = spark.createDataFrame(
            [], "row int, bucket bigint, bucket_count bigint"
        )
        self.batches = 0

    def apply_batch(self, counts: DataFrame, key_col: str, count_col: str) -> None:
        batch_grid = cms_sketch(
            counts, key_col, count_col, depth=self.depth, width=self.width
        )
        self.grid = (
            self.grid.unionByName(batch_grid)
            .groupBy("row", "bucket")
            .agg(F.sum("bucket_count").alias("bucket_count"))
            .localCheckpoint(eager=True)
        )
        self.batches += 1


def run_stream_cms(
    spark: SparkSession,
    sf_dir: str,
    depth: int = 4,
    width: int = 8,
    query_name: str = "stream_cms",
) -> DataFrame:
    """Drain the fixture events stream, folding each micro-batch's
    per-event-type counts into a running CMS grid; returns the final
    point estimates ``(event_type, est_count)`` for every event type
    observed (probe keys re-read batch-side, as x62's static join does).
    """
    from dirty_js_etl_spark.streaming.events import read_events_stream

    state = StreamingCms(spark, depth, width)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        counts = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("c")
        )
        state.apply_batch(counts, "event_type", "c")

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

    probes = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type")
        .distinct()
    )
    return cms_estimate(
        probes, state.grid, "event_type", depth=depth, width=width
    )
