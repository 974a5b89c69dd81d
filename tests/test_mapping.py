"""Mapping-compiler tests: group-by inference (T4), distinct pruning (T3),
FK cardinality (C13), filter (T2), and plan-shape assertions (the filter
must push to the parquet scan; the FK join must broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dirty_js_etl_spark.catalog import Catalog
from dirty_js_etl_spark.functions.combinators import (
    AggregateColumn,
    DirectCopy,
    ForeignKey,
    MergeOn,
)
from dirty_js_etl_spark.plans.mapping import MappingSpec, compile_mapping, prepare_source


def test_group_by_key_inference(catalog):
    spec = MappingSpec(
        destination="__out",
        source="lineitem",
        use_grouping=True,
        columns={
            "flag": DirectCopy("l_returnflag"),
            "qty": AggregateColumn("l_quantity", "SUM"),
            "n": AggregateColumn("l_orderkey", "COUNT"),
        },
    )
    assert spec.group_by_keys() == ["l_returnflag"]
    df = compile_mapping(spec, catalog).projected
    assert df.columns == ["flag", "qty", "n"]
    out = {r["flag"]: r for r in df.collect()}
    assert set(out) == {"A", "N", "R"}


def test_merge_on_is_group_key(catalog):
    # MergeOn sets isColumn (mappr.js:178) so merge keys join the GROUP BY
    spec = MappingSpec(
        destination="__out",
        source="orders",
        use_merge=True,
        use_grouping=True,
        columns={
            "k": MergeOn("o_custkey"),
            "total": AggregateColumn("o_totalprice", "SUM"),
        },
    )
    assert spec.group_by_keys() == ["o_custkey"]


def test_distinct_prunes_referenced_columns(catalog):
    spec = MappingSpec(
        destination="__out",
        source="orders",
        force_distinct=True,
        columns={"st": DirectCopy("o_orderstatus")},
    )
    df = compile_mapping(spec, catalog).projected
    assert df.count() == 3  # P/O/F — distinct applied pre-projection


def test_fk_duplicate_parent_no_row_multiplication(spark):
    # scalar-subquery cardinality: duplicate parent keys must not fan out
    cat = Catalog(spark)
    cat.register("child", spark.createDataFrame([(1, 10), (2, 20)], "id int, ref int"))
    cat.register(
        "parent",
        spark.createDataFrame(
            [(10, "a"), (10, "b"), (30, "c")], "pk int, payload string"
        ),
    )
    spec = MappingSpec(
        destination="__out",
        source="child",
        columns={
            "id": DirectCopy("id"),
            "val": ForeignKey("ref", "parent", "payload", "pk"),
        },
    )
    df = compile_mapping(spec, cat).projected
    out = sorted((r["id"], r["val"]) for r in df.collect())
    assert [i for i, _ in out] == [1, 2]  # no duplication
    assert out[0][1] in ("a", "b")  # one arbitrary match
    assert out[1][1] is None  # unmatched -> NULL


def test_fk_lookups_memoized(catalog):
    # two columns via the same lookup -> one join (mappr.js:290-294)
    fk = dict(parent_table="nation", parent_column="n_name", import_column="n_nationkey")
    spec = MappingSpec(
        destination="__out",
        source="customer",
        columns={
            "a": ForeignKey("c_nationkey", **fk),
            "b": ForeignKey("c_nationkey", **fk),
        },
    )
    assert len(spec.fk_lookups()) == 1
    df = compile_mapping(spec, catalog).projected
    row = df.limit(1).collect()[0]
    assert row["a"] == row["b"]


def test_fk_distinct_source_columns_get_distinct_joins(spark):
    # Two FK columns against the SAME parent but reading DIFFERENT fact
    # columns (ship_to vs bill_to) must not collapse into one join — the
    # reference memoizes only the generated function and passes each
    # column's own sourceColumn per invocation (mappr.js:298-304).
    cat = Catalog(spark)
    cat.register(
        "parent", spark.createDataFrame([(1, "US"), (2, "FR")], "nkey int, nname string")
    )
    cat.register(
        "fact",
        spark.createDataFrame(
            [(100, 1, 2), (200, 2, 1)], "id int, ship_to int, bill_to int"
        ),
    )
    spec = MappingSpec(
        destination="__out",
        source="fact",
        columns={
            "id": DirectCopy("id"),
            "ship_nation": ForeignKey("ship_to", "parent", "nname", "nkey"),
            "bill_nation": ForeignKey("bill_to", "parent", "nname", "nkey"),
        },
    )
    assert len(spec.fk_lookups()) == 2
    out = {
        r["id"]: (r["ship_nation"], r["bill_nation"])
        for r in compile_mapping(spec, cat).projected.collect()
    }
    assert out == {100: ("US", "FR"), 200: ("FR", "US")}


def test_filter_pushdown_reaches_scan(catalog):
    spec = MappingSpec(
        destination="__out",
        source="orders",
        source_filter="o_totalprice > 100000",
        columns={"k": DirectCopy("o_orderkey")},
    )
    df = compile_mapping(spec, catalog).projected
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_fk_join_broadcasts(catalog):
    spec = MappingSpec(
        destination="__out",
        source="customer",
        columns={
            "k": DirectCopy("c_custkey"),
            "nm": ForeignKey("c_nationkey", "nation", "n_name", "n_nationkey"),
        },
    )
    df = compile_mapping(spec, catalog).projected
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_tsql_dialect_filter(catalog):
    spec = MappingSpec(
        destination="__out",
        source="customer",
        source_filter="LEN([c_mktsegment]) > 0",
        filter_dialect="tsql",
        columns={"k": DirectCopy("c_custkey")},
    )
    df = compile_mapping(spec, catalog).projected
    assert df.count() == catalog.read("customer").count()


def test_empty_columns_rejected():
    with pytest.raises(ValueError):
        MappingSpec(destination="d", source="s", columns={})


def test_merge_requires_key():
    with pytest.raises(ValueError, match="MergeOn"):
        MappingSpec(
            destination="d",
            source="s",
            use_merge=True,
            columns={"a": DirectCopy("x")},
        )
