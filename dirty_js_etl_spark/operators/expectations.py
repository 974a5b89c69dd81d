"""Declarative data-quality expectations — a Great-Expectations-style
validation surface compiled into ONE aggregation pass.

Reference analog: the closest concept in `bruslim/dirty-js-etl` is the
implicit contract of its MERGE keys (rows must join) — it has no data
validation surface at all (SURVEY.md §2.3); this module supplies the
one a production pipeline runs before promoting a table.

Each :class:`Expectation` is (name, boolean Column); ``validate``
folds every rule into a single ``agg`` over the relation — one scan,
one 1-row result regardless of rule count (conditional aggregation,
the x78 FILTER-clause shape) — then explodes to one row per rule. At
100 TB this means validation costs exactly one pass over the data and
ships ``n_rules`` longs per partition to the final reduce; adding a
rule adds a column to the partial aggregate, not a job.

NULL semantics: a NULL predicate result counts as a VIOLATION (the row
failed to prove the property) — the conservative contract a gate
wants; spell ``col.isNull() | cond`` to opt NULLs out explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    condition: Column  # True = row passes


def not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", F.col(col).isNotNull())


def unique_key(*cols: str) -> "UniqueKey":
    return UniqueKey(cols)


@dataclass(frozen=True)
class UniqueKey:
    """Key-uniqueness check — the one expectation that cannot ride the
    single-pass fold (it needs a groupBy on the key); validated with
    one extra key-shuffled aggregation and unioned into the report."""

    cols: tuple[str, ...]

    @property
    def name(self) -> str:
        return "unique_" + "_".join(self.cols)


def validate(
    df: DataFrame,
    rules: list[Expectation | UniqueKey],
) -> DataFrame:
    """Run every rule; returns ``(rule, n_rows, n_violations, ok)`` —
    one row per rule, deterministic order-insensitive content."""
    row_rules = [r for r in rules if isinstance(r, Expectation)]
    key_rules = [r for r in rules if isinstance(r, UniqueKey)]
    parts = []
    if row_rules:
        aggs = [F.count(F.lit(1)).cast("long").alias("__n")] + [
            F.sum(
                F.when(r.condition, 0).otherwise(1)  # NULL -> violation
            )
            .cast("long")
            .alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        one = df.agg(*aggs)
        report = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
                for i, r in enumerate(row_rules)
            ]
        )
        parts.append(
            one.select(F.explode(report).alias("r")).select(
                "r.rule", "r.n_rows", "r.n_violations"
            )
        )
    for kr in key_rules:
        dup = (
            df.groupBy(*[F.col(c) for c in kr.cols])
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.sum("__c").cast("long").alias("n_rows"),
                F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
                .cast("long")
                .alias("n_violations"),
            )
            .select(
                F.lit(kr.name).alias("rule"), "n_rows", "n_violations"
            )
        )
        parts.append(dup)
    if not parts:
        raise ValueError(
            "validate() needs at least one Expectation or UniqueKey rule"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("ok", F.col("n_violations") == 0)
