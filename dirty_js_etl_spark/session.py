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
        # Prefer shuffled-hash over sort-merge joins when the planner's
        # size conditions hold, and let AQE convert SMJ→SHJ at runtime
        # when every post-shuffle build partition is under 64 MB
        # (guide §3.1): hash probing skips both sides' sorts. r13 A/B on
        # the join-heavy headline subset: 20.7 → 15.9 s (x194 TPC-H Q2
        # 2.5 → 0.94 s), flat canary both runs. Scale-safe by
        # construction — the 64 MB per-partition threshold is what
        # bounds the in-memory hash map on a cluster, and SMJ remains
        # the fallback above it; zstd shuffle compression and a smaller
        # AQE minPartitionSize were A/B'd alongside and REJECTED (both
        # regressed: shuffle payloads here are too small to amortize
        # zstd CPU or extra tasks). Override via SPARK_GRAFT_EXTRA_CONF.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # single-JVM local mode: the driver heap IS the executor heap.
        # Measured on this box: 8g beats 64g by >10x on shuffle-heavy
        # queries (oversized G1 heaps collapse on these vCPUs) — keep the
        # heap small and clear persisted frames between workloads instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # cluster-tuning hook: ';'-separated key=value pairs, applied last so
    # a deployment (or an A/B run) can override any default above without
    # code changes, e.g. SPARK_GRAFT_EXTRA_CONF=
    # "spark.sql.shuffle.partitions=2000;spark.io.compression.codec=zstd"
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
