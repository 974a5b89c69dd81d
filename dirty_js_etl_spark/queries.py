"""Driver-facing query registry: one (Spark query, DuckDB oracle) pair per
implemented operator from SURVEY.md §2.

Every query callable takes ``(spark, sf_dir)`` and returns a DataFrame;
the paired oracle is ANSI/DuckDB SQL over the same parquet tables that
must produce identical row count, column names, and (order-insensitive)
values. Column names are aliased identically on both sides — the driver
sorts columns by name before hashing.

Float-determinism rules used throughout (so cross-engine hashes match):

- sums over integral-valued doubles (``l_quantity``) are exact in IEEE
  double regardless of order — safe;
- money sums go through ``CAST(x AS DECIMAL(18,2))`` (exact, associative)
  and the *result* is cast to DOUBLE on both sides so the output type and
  bits agree;
- double→int casts: Spark truncates toward zero, DuckDB rounds — oracles
  spell ``CAST(trunc(x) AS INT)`` to pin truncation semantics.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dirty_js_etl_spark.catalog import Catalog, fixture_catalog
from dirty_js_etl_spark.functions.combinators import (
    AggregateColumn,
    CaseMap,
    CastAs,
    ConcatColumns,
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

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None -> driver does a rows-only check


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: rq.oracle for name, rq in _REGISTRY.items() if rq.oracle}


# ---------------------------------------------------------------------------
# Flagship fixture: the reference's users-merge scenario (FIXTURES.md §C)
# transposed onto the driver tables. ``users_dest`` is a deterministic
# derived snapshot (even custkeys, stale values, one unmapped column) that
# the merge upserts the full ``customer`` relation over.
# ---------------------------------------------------------------------------


def users_dest(cat: Catalog) -> DataFrame:
    c = cat.read("customer")
    return c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("orig_id"),
        F.upper(F.col("c_name")).alias("user_nm"),
        F.lit(0).alias("acct_i"),
        F.lit(None).cast("string").alias("nation_nm"),
        F.lit("STALE").alias("mktseg"),
        F.lit("D").alias("tag"),
        F.concat(F.lit("legacy-"), F.col("c_custkey").cast("string")).alias(
            "legacy_note"
        ),
    )


def users_mapping(**overrides) -> MappingSpec:
    """The flagship mapping — reference ``mappings/users.js`` transposed:
    MergeOn (C12), ConcatColumns (C7), CastAs (C2), ForeignKey (C13),
    CopyOrDefault (C8), RawValue (C3) into one merge (T5) with audit (T6).
    """
    kw = dict(
        destination="users",
        source="customer",
        use_merge=True,
        columns={
            "orig_id": MergeOn("c_custkey"),
            "user_nm": ConcatColumns(["c_name", "c_mktsegment"]),
            "acct_i": CastAs("c_acctbal", "INT"),
            "nation_nm": ForeignKey(
                "c_nationkey", "nation", "n_name", "n_nationkey"
            ),
            "mktseg": CopyOrDefault("c_mktsegment", "UNKNOWN"),
            "tag": RawValue("S"),
        },
    )
    kw.update(overrides)
    return MappingSpec(**kw)


# Shared oracle CTEs mirroring users_dest / users_mapping exactly.
_USERS_CTE = """
WITH dest AS (
  SELECT c_custkey AS orig_id,
         upper(c_name) AS user_nm,
         0 AS acct_i,
         CAST(NULL AS VARCHAR) AS nation_nm,
         'STALE' AS mktseg,
         'D' AS tag,
         'legacy-' || CAST(c_custkey AS VARCHAR) AS legacy_note
  FROM customer WHERE c_custkey % 2 = 0
),
src AS (
  SELECT c.c_custkey AS orig_id,
         trim(coalesce(c.c_name, '') || ' ' || coalesce(c.c_mktsegment, '')) AS user_nm,
         CAST(trunc(c.c_acctbal) AS INT) AS acct_i,
         n.n_name AS nation_nm,
         CASE WHEN c.c_mktsegment IS NULL OR length(rtrim(c.c_mktsegment)) = 0
              THEN 'UNKNOWN' ELSE c.c_mktsegment END AS mktseg,
         'S' AS tag
  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
)
"""


def _cat(spark: SparkSession, sf_dir: str) -> Catalog:
    return fixture_catalog(spark, sf_dir)


def _users_cat(spark: SparkSession, sf_dir: str) -> Catalog:
    cat = _cat(spark, sf_dir)
    cat.register("users", users_dest(cat))
    return cat


def _project(spec: MappingSpec, spark: SparkSession, sf_dir: str) -> DataFrame:
    return compile_mapping(spec, _cat(spark, sf_dir)).projected


def _select_spec(columns: dict, source: str, **kw) -> MappingSpec:
    return MappingSpec(destination="__out", source=source, columns=columns, **kw)


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


# ---------------------------------------------------------------------------
# T2/T3: source filter + distinct
# ---------------------------------------------------------------------------


@register(
    "t2_source_filter",
    "SELECT o_orderkey AS okey, o_totalprice AS price FROM orders "
    "WHERE o_totalprice > 100000 AND o_orderstatus = 'O'",
)
def t2_source_filter(spark, sf_dir):
    spec = _select_spec(
        {"okey": DirectCopy("o_orderkey"), "price": DirectCopy("o_totalprice")},
        "orders",
        source_filter="o_totalprice > 100000 AND o_orderstatus = 'O'",
    )
    return _project(spec, spark, sf_dir)


@register(
    "t3_force_distinct",
    "SELECT DISTINCT o_custkey AS custkey, o_orderstatus AS status FROM orders",
)
def t3_force_distinct(spark, sf_dir):
    spec = _select_spec(
        {
            "custkey": DirectCopy("o_custkey"),
            "status": DirectCopy("o_orderstatus"),
        },
        "orders",
        force_distinct=True,
    )
    return _project(spec, spark, sf_dir)


# ---------------------------------------------------------------------------
# T5/T6/T7/T9/T11: merge matrix, audit, append, cleanup, idempotency
# ---------------------------------------------------------------------------

_MERGE_FULL_SELECT = """
SELECT
  CASE WHEN s.orig_id IS NOT NULL THEN s.orig_id ELSE d.orig_id END AS orig_id,
  CASE WHEN s.orig_id IS NOT NULL THEN s.user_nm ELSE d.user_nm END AS user_nm,
  CASE WHEN s.orig_id IS NOT NULL THEN s.acct_i ELSE d.acct_i END AS acct_i,
  CASE WHEN s.orig_id IS NOT NULL THEN s.nation_nm ELSE d.nation_nm END AS nation_nm,
  CASE WHEN s.orig_id IS NOT NULL THEN s.mktseg ELSE d.mktseg END AS mktseg,
  CASE WHEN s.orig_id IS NOT NULL THEN s.tag ELSE d.tag END AS tag,
  d.legacy_note AS legacy_note
FROM dest d FULL OUTER JOIN src s ON d.orig_id = s.orig_id
"""


def _run_users(spark, sf_dir, **overrides):
    cat = _users_cat(spark, sf_dir)
    return run_mapping(users_mapping(**overrides), cat)


@register("t5_merge_full", _USERS_CTE + _MERGE_FULL_SELECT)
def t5_merge_full(spark, sf_dir):
    return _run_users(spark, sf_dir).result


@register(
    "t5_merge_insert_only",
    _USERS_CTE
    + """
SELECT
  coalesce(d.orig_id, s.orig_id) AS orig_id,
  CASE WHEN d.orig_id IS NOT NULL THEN d.user_nm ELSE s.user_nm END AS user_nm,
  CASE WHEN d.orig_id IS NOT NULL THEN d.acct_i ELSE s.acct_i END AS acct_i,
  CASE WHEN d.orig_id IS NOT NULL THEN d.nation_nm ELSE s.nation_nm END AS nation_nm,
  CASE WHEN d.orig_id IS NOT NULL THEN d.mktseg ELSE s.mktseg END AS mktseg,
  CASE WHEN d.orig_id IS NOT NULL THEN d.tag ELSE s.tag END AS tag,
  d.legacy_note AS legacy_note
FROM dest d FULL OUTER JOIN src s ON d.orig_id = s.orig_id
""",
)
def t5_merge_insert_only(spark, sf_dir):
    # WHEN MATCHED suppressed (tsql2008.js:304-308): matched rows keep dest
    return _run_users(spark, sf_dir, insert_only=True).result


@register(
    "t5_merge_update_only",
    _USERS_CTE
    + """
SELECT
  d.orig_id AS orig_id,
  CASE WHEN s.orig_id IS NOT NULL THEN s.user_nm ELSE d.user_nm END AS user_nm,
  CASE WHEN s.orig_id IS NOT NULL THEN s.acct_i ELSE d.acct_i END AS acct_i,
  CASE WHEN s.orig_id IS NOT NULL THEN s.nation_nm ELSE d.nation_nm END AS nation_nm,
  CASE WHEN s.orig_id IS NOT NULL THEN s.mktseg ELSE d.mktseg END AS mktseg,
  CASE WHEN s.orig_id IS NOT NULL THEN s.tag ELSE d.tag END AS tag,
  d.legacy_note AS legacy_note
FROM dest d LEFT JOIN src s ON d.orig_id = s.orig_id
""",
)
def t5_merge_update_only(spark, sf_dir):
    # WHEN NOT MATCHED suppressed (tsql2008.js:310-314): no inserts
    return _run_users(spark, sf_dir, update_only=True).result


@register(
    "t5_merge_pk",
    _USERS_CTE
    + """
SELECT
  CASE WHEN s.orig_id IS NOT NULL THEN s.orig_id ELSE d.orig_id END AS orig_id,
  CASE WHEN s.orig_id IS NOT NULL THEN s.user_nm ELSE d.user_nm END AS user_nm,
  CASE WHEN s.orig_id IS NOT NULL THEN s.acct_i ELSE d.acct_i END AS acct_i,
  CASE WHEN s.orig_id IS NOT NULL THEN s.nation_nm ELSE d.nation_nm END AS nation_nm,
  CASE WHEN s.orig_id IS NOT NULL THEN s.mktseg ELSE d.mktseg END AS mktseg,
  CASE WHEN d.orig_id IS NULL THEN s.tag ELSE d.tag END AS tag,
  d.legacy_note AS legacy_note
FROM dest d FULL OUTER JOIN src s ON d.orig_id = s.orig_id
""",
)
def t5_merge_pk(spark, sf_dir):
    # mergePk columns excluded from UPDATE SET (tsql2008.js:296-299):
    # matched rows keep the dest 'tag', inserts still get the source value
    return _run_users(spark, sf_dir, merge_pk=("tag",)).result


@register(
    "t6_audit",
    _USERS_CTE
    + """
SELECT
  CASE WHEN d.orig_id IS NOT NULL THEN 'UPDATE' ELSE 'INSERT' END AS _action,
  s.orig_id AS orig_id, s.user_nm AS user_nm, s.acct_i AS acct_i,
  s.nation_nm AS nation_nm, s.mktseg AS mktseg, s.tag AS tag,
  d.legacy_note AS legacy_note
FROM src s LEFT JOIN dest d ON d.orig_id = s.orig_id
""",
)
def t6_audit(spark, sf_dir):
    # OUTPUT $action, Inserted.* (tsql2008.js:294-316)
    return _run_users(spark, sf_dir).audit


@register(
    "t7_insert_select",
    _USERS_CTE
    + """
SELECT * FROM dest
UNION ALL
SELECT s.*, CAST(NULL AS VARCHAR) AS legacy_note FROM src s
""",
)
def t7_insert_select(spark, sf_dir):
    # non-merge append path (tsql2008.js:319-343); unmapped dest columns
    # become NULL like an INSERT with a partial column list
    cat = _users_cat(spark, sf_dir)
    return run_mapping(users_mapping(use_merge=False), cat).result


@register(
    "t9_kill_where",
    _USERS_CTE
    + """
SELECT * FROM dest WHERE NOT coalesce(orig_id % 4 = 0, FALSE)
UNION ALL
SELECT s.*, CAST(NULL AS VARCHAR) AS legacy_note FROM src s
""",
)
def t9_kill_where(spark, sf_dir):
    # conditional-delete cleanup (T9) runs before the body, then the
    # non-merge mapping appends — exercised through the Pipeline runner
    cat = _users_cat(spark, sf_dir)
    pipe = Pipeline().use_mapping(
        users_mapping(use_merge=False, kill_where="orig_id % 4 = 0")
    )
    return pipe.run(cat)["users"].result


@register("t11_idempotent_merge", _USERS_CTE + _MERGE_FULL_SELECT)
def t11_idempotent_merge(spark, sf_dir):
    # two passes over the same source (tsql2008.js:345-358); the oracle is
    # the SINGLE-pass result — hash equality IS the idempotency proof
    cat = _users_cat(spark, sf_dir)
    pipe = Pipeline(passes=2).use_mapping(users_mapping())
    return pipe.run(cat)["users"].result
