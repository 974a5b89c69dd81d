"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM; the settings below are the ones that still
matter there (shuffle partition count, AQE, Arrow). On a real cluster the
same builder is correct — AQE coalesces the 32-partition default upward
and the skew-join/broadcast settings kick in where they matter at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "dirty_js_etl_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic broadcast conversion — the main levers that keep the same
      plan healthy from sf0.001 (6k rows) to 100 TB.
    - ``spark.sql.session.timeZone=UTC``: parity with the DuckDB oracle
      (DuckDB timestamps are UTC-naive).
    - Arrow enabled: every Pandas-UDF path (multimodal, minhash batch
      ops) transfers columnar batches, not pickled rows.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet writers that omit the isAdjustedToUTC flag (e.g. pandas/
        # pyarrow defaults) would otherwise surface as TIMESTAMP_NTZ under
        # Spark 4's inference, breaking epoch math (cast to long is an
        # AnalysisException on NTZ under ANSI mode) and streaming
        # watermarks. Force LTZ reads — with the UTC session timezone above
        # this matches how the DuckDB oracle reads the same files.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # single-JVM local mode: the driver heap IS the executor heap.
        # Measured on this box: 8g beats 64g by >10x on shuffle-heavy
        # queries (oversized G1 heaps collapse on these vCPUs) — keep the
        # heap small and clear persisted frames between workloads instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
