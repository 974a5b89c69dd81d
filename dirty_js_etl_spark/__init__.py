"""dirty_js_etl_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference tool
``bruslim/dirty-js-etl`` (a T-SQL script generator; see SURVEY.md) as an
idiomatic Spark engine:

- the reference's declarative column-mapping DSL (15 combinators,
  ``/root/reference/mappr.js``) becomes :mod:`dirty_js_etl_spark.functions.combinators`
  — functions returning :class:`ColumnSpec` objects that wrap lazy
  ``pyspark.sql.Column`` expressions plus the metadata that drives
  group-by inference and merge-key classification;
- the reference's codegen backend (``/root/reference/tsql2008.js``) becomes
  :mod:`dirty_js_etl_spark.plans.mapping` (compile a ``MappingSpec`` to a
  DataFrame pipeline) and :mod:`dirty_js_etl_spark.operators.merge` (the
  join-based MERGE/upsert with audit stream);
- the reference's driver (``etl.js`` / ``tables.js``) becomes
  :mod:`dirty_js_etl_spark.plans.runner` (ordered registry, multi-pass,
  dry-run, setup/teardown hooks, cleanup).

Beyond reference parity, :mod:`dirty_js_etl_spark.operators` adds the
large-scale training-data-pipeline operators: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
search (brute-force + LSH-bucketed top-k), text analysis (language id,
quality scoring, token counts, fingerprints) and multimodal column
plumbing. Everything is built on the DataFrame API so Catalyst handles
pushdown/pruning/join-strategy; no RDDs, no driver-side row loops.
"""

from dirty_js_etl_spark.functions.combinators import (  # noqa: F401
    AggregateColumn,
    CaseMap,
    CastAs,
    ColumnSpec,
    ConcatColumns,
    CopyOrClear,
    CopyOrDefault,
    DirectCopy,
    ForeignKey,
    InvertBit,
    MergeOn,
    RawValue,
    Sql,
    SqlFunction,
    StaticHash,
    TruncateString,
)
from dirty_js_etl_spark.plans.mapping import MappingSpec, compile_mapping  # noqa: F401
from dirty_js_etl_spark.plans.runner import Pipeline  # noqa: F401

__all__ = [
    "AggregateColumn",
    "CaseMap",
    "CastAs",
    "ColumnSpec",
    "ConcatColumns",
    "CopyOrClear",
    "CopyOrDefault",
    "DirectCopy",
    "ForeignKey",
    "InvertBit",
    "MergeOn",
    "RawValue",
    "Sql",
    "SqlFunction",
    "StaticHash",
    "TruncateString",
    "MappingSpec",
    "compile_mapping",
    "Pipeline",
]

__version__ = "0.1.0"
