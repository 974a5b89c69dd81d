"""Source/sink registry — format-dispatching readers and writers.

The reference's only "sources" are named tables/views in the source
database (``mappings/users.js:10``; SURVEY.md §2.3 — no file formats, no
connectors). Spark-first, sources are format readers feeding the same
Catalog abstraction; this registry centralizes options so mappings stay
format-agnostic.

Scale notes baked into the defaults:

- parquet is the primary format (columnar, predicate pushdown, column
  pruning — the scan end of every Catalyst optimization);
- csv/json readers take explicit schemas (``inferSchema`` double-reads
  the data — never at 100 TB);
- the writer defaults to snappy parquet with optional ``partitionBy``
  (partition pruning for downstream readers) and ``bucketBy`` via
  ``saveAsTable`` (co-located joins, no shuffle on the bucket key).
- Delta/Iceberg are gated behind import-tries: their jars are not in this
  image; on a cluster the same writer API upgrades to ACID MERGE targets.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class SourceSpec:
    path: str
    fmt: str = "parquet"
    schema: T.StructType | str | None = None
    options: dict[str, Any] = field(default_factory=dict)


def read_source(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    reader = spark.read.format(spec.fmt)
    if spec.schema is not None:
        reader = reader.schema(spec.schema)
    elif spec.fmt in ("csv", "json"):
        raise ValueError(
            f"{spec.fmt} source requires an explicit schema (inferSchema "
            "re-reads the data — disallowed by policy at scale)"
        )
    if spec.fmt == "csv":
        reader = reader.option("header", spec.options.pop("header", "true"))
    for k, v in spec.options.items():
        reader = reader.option(k, v)
    return reader.load(spec.path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    writer = df.write.format(fmt).mode(mode).option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", "true")  # mirror the reader default
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) table.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle — each bucket pairs off directly (plan shows no
    Exchange; asserted in tests). This is the storage-side answer to
    repeated large-to-large joins: pay the partitioning once at write
    time instead of per query. ``num_buckets`` should be sized so one
    bucket ≈ one healthy task (~100-500 MB at cluster scale).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def delta_available(spark: SparkSession) -> bool:
    """Import-try gate for the Delta Lake connector (not in this image)."""
    try:
        spark._jvm.io.delta.tables.DeltaTable  # noqa: B018
        return True
    except Exception:  # noqa: BLE001
        return False
