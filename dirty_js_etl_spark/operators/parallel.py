"""CPU-density partitioning: pin parallelism where AQE's byte-based
coalescing is wrong.

AQE coalesces post-shuffle partitions toward a BYTE target
(``advisoryPartitionSizeInBytes``), which is correct for scan/agg
stages whose cost is proportional to bytes. It is wrong for the
CPU-DENSE stages of the pair enumerators: a value-deduped linkage table
is a few hundred KB (AQE folds it to ONE partition) but the stage above
it evaluates a quadratic number of banded Levenshteins per row — the
r13 profile measured x210's enumeration as a single 4.5 s task on a
32-core box. Bytes are a proxy AQE trusts; the per-row join work is
invisible to it.

:func:`spread_for_cpu` hash-repartitions such a frame to the session's
``spark.sql.shuffle.partitions`` — the cluster-sized knob (local: the
core count via ``SPARK_GRAFT_CPUS``; production: whatever the cluster
sets), NOT a constant — so the enumeration stage always has the
configured parallelism regardless of how few bytes feed it. The pinned
count opts the exchange out of AQE coalescing by design. Results are
partitioning-invariant (the registry audit pins this), so this is a
pure plan change.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame


def spread_for_cpu(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Hash-repartition ``df`` by ``cols`` to the session's configured
    shuffle parallelism, pinning the count so AQE cannot fold the
    downstream CPU-dense stage to one task.

    ``SPARK_GRAFT_NO_CPU_SPREAD=1`` short-circuits (A/B hook, the
    ``SPARK_GRAFT_NO_SPREAD`` idiom)."""
    if os.environ.get("SPARK_GRAFT_NO_CPU_SPREAD"):
        return df
    n = int(str(df.sparkSession.conf.get("spark.sql.shuffle.partitions")))
    return df.repartition(n, *cols)
