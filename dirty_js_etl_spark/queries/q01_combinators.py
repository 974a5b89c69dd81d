"""Split from the original queries.py (registration order preserved)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dirty_js_etl_spark.catalog import Catalog, fixture_catalog
from dirty_js_etl_spark.functions.combinators import (
    AggregateColumn,
    CaseMap,
    CastAs,
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
from dirty_js_etl_spark.plans.mapping import MappingSpec, compile_mapping, run_mapping
from dirty_js_etl_spark.plans.runner import Pipeline

from dirty_js_etl_spark.queries._shared import _project, _select_spec, register

# ---------------------------------------------------------------------------
# C1-C15 scalar combinators
# ---------------------------------------------------------------------------


@register(
    "c1_direct_copy",
    "SELECT c_custkey AS custkey, c_name AS name FROM customer",
)
def c1_direct_copy(spark, sf_dir):
    spec = _select_spec(
        {"custkey": DirectCopy("c_custkey"), "name": DirectCopy("c_name")},
        "customer",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c2_cast_as",
    "SELECT CAST(trunc(c_acctbal) AS INT) AS bal_i, "
    "CAST(c_custkey AS VARCHAR) AS key_s FROM customer",
)
def c2_cast_as(spark, sf_dir):
    spec = _select_spec(
        {
            "bal_i": CastAs("c_acctbal", "INT"),
            "key_s": CastAs("c_custkey", "NVARCHAR(64)"),
        },
        "customer",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c3_raw_value",
    "SELECT r_regionkey AS k, 'fixed' AS s, 42 AS n, "
    "CAST(NULL AS VARCHAR) AS nil FROM region",
)
def c3_raw_value(spark, sf_dir):
    spec = _select_spec(
        {
            "k": DirectCopy("r_regionkey"),
            "s": RawValue("fixed"),
            "n": RawValue(42),
            "nil": RawValue(None, dtype="NVARCHAR"),
        },
        "region",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c4_case_map",
    "SELECT o_orderkey AS okey, "
    "CASE WHEN o_orderpriority = '1-URGENT' THEN 'P0' "
    "     WHEN o_orderpriority = '2-HIGH' THEN 'P1' "
    "     WHEN o_orderpriority = '3-MEDIUM' THEN 'P2' "
    "     ELSE 'P3' END AS prio FROM orders",
)
def c4_case_map(spark, sf_dir):
    spec = _select_spec(
        {
            "okey": DirectCopy("o_orderkey"),
            "prio": CaseMap(
                "o_orderpriority",
                {"1-URGENT": "P0", "2-HIGH": "P1", "3-MEDIUM": "P2"},
                default="P3",
            ),
        },
        "orders",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c5_invert_bit",
    "SELECT l_orderkey AS okey, l_linenumber AS line, "
    "CASE WHEN l_linenumber = 1 THEN 0 ELSE 1 END AS not_first FROM lineitem",
)
def c5_invert_bit(spark, sf_dir):
    spec = _select_spec(
        {
            "okey": DirectCopy("l_orderkey"),
            "line": DirectCopy("l_linenumber"),
            "not_first": InvertBit("l_linenumber"),
        },
        "lineitem",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c6_truncate_string",
    "SELECT p_partkey AS pkey, "
    "nullif(rtrim(substr(p_name, 1, 12)), '') AS name12 FROM part",
)
def c6_truncate_string(spark, sf_dir):
    spec = _select_spec(
        {
            "pkey": DirectCopy("p_partkey"),
            "name12": TruncateString("p_name", 12),
        },
        "part",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c7_concat_columns",
    "SELECT c_custkey AS custkey, "
    "trim(coalesce(c_name, '') || ' ' || coalesce(c_mktsegment, '')) AS full_nm "
    "FROM customer",
)
def c7_concat_columns(spark, sf_dir):
    spec = _select_spec(
        {
            "custkey": DirectCopy("c_custkey"),
            "full_nm": ConcatColumns(["c_name", "c_mktsegment"]),
        },
        "customer",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c8_copy_or_default",
    "SELECT c_custkey AS custkey, "
    "CASE WHEN c_mktsegment IS NULL OR length(rtrim(c_mktsegment)) = 0 "
    "THEN 'UNKNOWN' ELSE c_mktsegment END AS seg FROM customer",
)
def c8_copy_or_default(spark, sf_dir):
    spec = _select_spec(
        {
            "custkey": DirectCopy("c_custkey"),
            "seg": CopyOrDefault("c_mktsegment", "UNKNOWN"),
        },
        "customer",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c9_copy_or_clear",
    "SELECT c_custkey AS custkey, "
    "CASE WHEN c_mktsegment IS NULL OR length(rtrim(c_mktsegment)) = 0 "
    "THEN NULL ELSE c_mktsegment END AS seg FROM customer",
)
def c9_copy_or_clear(spark, sf_dir):
    # C9 is C8 with a NULL default ("clear"): empty-or-null -> NULL
    spec = _select_spec(
        {
            "custkey": DirectCopy("c_custkey"),
            "seg": CopyOrClear("c_mktsegment"),
        },
        "customer",
    )
    return _project(spec, spark, sf_dir)


# StaticHash: digest computed driver-side at plan-build time (C10) — the
# oracle embeds the same literal, proving the generation-time semantics.
_C10_DIGEST = "2a1b5084e9c310025c1b3c574a4d8e0f"


@register(
    "c10_static_hash",
    f"SELECT r_regionkey AS k, '{_C10_DIGEST}' AS secret_hash FROM region",
)
def c10_static_hash(spark, sf_dir):
    spec = _select_spec(
        {
            "k": DirectCopy("r_regionkey"),
            "secret_hash": StaticHash("dirty-js-etl", algorithm="md5", encoding="hex"),
        },
        "region",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c11_t4_grouping",
    "SELECT l_returnflag, l_linestatus, "
    "SUM(l_quantity) AS l_quantity, "
    "CAST(COUNT(l_orderkey) AS BIGINT) AS l_orderkey FROM lineitem "
    "GROUP BY l_returnflag, l_linestatus",
)
def c11_t4_grouping(spark, sf_dir):
    # GROUP BY keys inferred from the isColumn-flagged mappings (T4);
    # aggregates aliased back to their source names (tsql2008.js:235-238).
    spec = _select_spec(
        {
            "l_returnflag": DirectCopy("l_returnflag"),
            "l_linestatus": DirectCopy("l_linestatus"),
            "l_quantity": AggregateColumn("l_quantity", "SUM"),
            "l_orderkey": AggregateColumn("l_orderkey", "COUNT"),
        },
        "lineitem",
        use_grouping=True,
    )
    return _project(spec, spark, sf_dir)


@register(
    "c13_foreign_key",
    "SELECT c.c_custkey AS custkey, n.n_name AS nation_nm FROM customer c "
    "LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey",
)
def c13_foreign_key(spark, sf_dir):
    spec = _select_spec(
        {
            "custkey": DirectCopy("c_custkey"),
            "nation_nm": ForeignKey("c_nationkey", "nation", "n_name", "n_nationkey"),
        },
        "customer",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c13_foreign_key_filtered",
    "SELECT c.c_custkey AS custkey, n.n_name AS nation_r1 FROM customer c "
    "LEFT JOIN (SELECT * FROM nation WHERE n_regionkey = 1) n "
    "ON c.c_nationkey = n.n_nationkey",
)
def c13_foreign_key_filtered(spark, sf_dir):
    # filterColumn/filterValue variant (mappr.js:297-306: extra WHERE
    # equality inside the generated lookup fn)
    spec = _select_spec(
        {
            "custkey": DirectCopy("c_custkey"),
            "nation_r1": ForeignKey(
                "c_nationkey",
                "nation",
                "n_name",
                "n_nationkey",
                filter_column="n_regionkey",
                filter_value=1,
            ),
        },
        "customer",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c14_sql_function",
    "SELECT c_custkey AS custkey, upper(c_name) AS name_u, "
    "round(c_acctbal, 1) AS bal_r FROM customer",
)
def c14_sql_function(spark, sf_dir):
    spec = _select_spec(
        {
            "custkey": DirectCopy("c_custkey"),
            "name_u": SqlFunction("upper", columns=["c_name"]),
            "bal_r": SqlFunction("round", columns=["c_acctbal"], raws=[1]),
        },
        "customer",
    )
    return _project(spec, spark, sf_dir)


@register(
    "c15_sql_expr",
    "SELECT o_orderkey AS okey, o_totalprice * 2 AS double_price, "
    "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final FROM orders",
)
def c15_sql_expr(spark, sf_dir):
    spec = _select_spec(
        {
            "okey": DirectCopy("o_orderkey"),
            "double_price": Sql("o_totalprice * 2", source_column="o_totalprice"),
            "is_final": Sql(
                "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END",
                source_column="o_orderstatus",
            ),
        },
        "orders",
    )
    return _project(spec, spark, sf_dir)


