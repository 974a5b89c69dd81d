"""Vectorized (Arrow-batched) Pandas UDFs — the C14 extension path for
scalar functions no Spark builtin covers (``SqlFunction``,
``mappr.js:308-329``, resolves registered names identically to builtins).

NOTE: no ``from __future__ import annotations`` here — pandas_udf reads
the *runtime* type hints to pick the eval mode, so they must stay real
types, not strings.

Scale: pandas UDFs move data executor-side in Arrow record batches and
evaluate vectorized numpy — ~10-100× over row-at-a-time Python UDFs —
but they still serialize out of the JVM, so they stay out of hot paths
unless no ``pyspark.sql.functions`` composition expresses the logic.
"""

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def log1p_val(v: pd.Series) -> pd.Series:
    import numpy as np

    return pd.Series(np.log1p(v))


def register_udfs(spark: SparkSession) -> None:
    """Register the library's named UDFs so ``SqlFunction``/``Sql``
    combinators (and plain ``spark.sql``) resolve them by name."""
    spark.udf.register("log1p_val", log1p_val)
