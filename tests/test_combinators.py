"""Semantic-parity micro-tests for the combinator library (SURVEY.md §5.1
item 4): the T-SQL NULL/empty quirks each combinator must reproduce."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dirty_js_etl_spark.functions.combinators import (
    CaseMap,
    CastAs,
    ConcatColumns,
    CopyOrClear,
    CopyOrDefault,
    InvertBit,
    MergeOn,
    RawValue,
    SqlFunction,
    StaticHash,
    TruncateString,
    resolve_type,
)
from dirty_js_etl_spark.functions import tsql_compat


def _vals(spark, spec, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(spec.expr.alias("out")).collect()]


def test_invert_bit_null_becomes_one(spark):
    # CASE WHEN c=1 THEN 0 ELSE 1 END — NULL falls into ELSE (mappr.js:191-202)
    out = _vals(spark, InvertBit("b"), [(1,), (0,), (None,), (2,)], "b int")
    assert out == [0, 1, 1, 1]


def test_truncate_string_trims_then_nulls_empty(spark):
    spec = TruncateString("s", 5)
    out = _vals(
        spark,
        spec,
        [("abcdefgh",), ("ab   x",), ("   ",), ("",), (None,)],
        "s string",
    )
    # RTRIM(LEFT(s,5)); empty -> NULL (mappr.js:203-215)
    assert out == ["abcde", "ab", None, None, None]


def test_concat_columns_null_safe_with_spacer(spark):
    spec = ConcatColumns(["a", "b", "c"], spacer=" ")
    rows = [("x", "y", "z"), ("x", None, "z"), (None, None, None), ("x", "", "z")]
    out = _vals(spark, spec, rows, "a string, b string, c string")
    # NULL parts coalesce to '' keeping their spacer (doubled interior
    # spacer), outer trim only strips the ends (mappr.js:216-235)
    assert out == ["x y z", "x  z", "", "x  z"]


def test_copy_or_default_empty_and_whitespace(spark):
    spec = CopyOrDefault("s", "DFLT")
    out = _vals(spark, spec, [("v",), ("",), ("   ",), (None,)], "s string")
    # T-SQL LEN ignores trailing spaces -> whitespace-only counts empty
    assert out == ["v", "DFLT", "DFLT", "DFLT"]


def test_copy_or_clear_is_alias(spark):
    out = _vals(spark, CopyOrClear("s"), [("v",), ("",)], "s string")
    assert out == ["v", None]


def test_case_map_string_keys_and_default(spark):
    spec = CaseMap("s", {"a": "A", "b": "B"}, default="Z")
    out = _vals(spark, spec, [("a",), ("b",), ("q",), (None,)], "s string")
    assert out == ["A", "B", "Z", "Z"]


def test_static_hash_matches_reference_defaults():
    # default sha512/base64 (mappr.js:236-246); digest embedded as literal
    import base64
    import hashlib

    spec = StaticHash("pw")
    expected = base64.b64encode(hashlib.sha512(b"pw").digest()).decode()
    assert f"'{expected}'" in str(spec.expr._jc) or expected in str(spec.expr._jc)


def test_raw_value_null(spark):
    assert _vals(spark, RawValue(None, dtype="NVARCHAR"), [(1,)], "x int") == [None]
    assert _vals(spark, RawValue(7), [(1,)], "x int") == [7]


def test_cast_as_tsql_types(spark):
    assert resolve_type("NVARCHAR(64)") == "string"
    assert resolve_type("UNIQUEIDENTIFIER") == "string"
    assert resolve_type("DATETIME") == "timestamp"
    assert resolve_type("DECIMAL(10,2)") == "decimal(10,2)"
    out = _vals(spark, CastAs("x", "INT"), [(3.9,), (-3.9,)], "x double")
    assert out == [3, -3]  # truncation toward zero, not rounding


def test_merge_on_forms():
    col_form = MergeOn("k")
    assert col_form.merge_on.kind == "column"
    val_form = MergeOn(value=5)
    assert val_form.merge_on.kind == "value" and val_form.merge_on.value == 5
    null_form = MergeOn(value=None)
    assert null_form.merge_on.kind == "null"
    with pytest.raises(ValueError):
        MergeOn()


def test_tsql_compat_translate():
    assert tsql_compat.translate("GETDATE()") == "current_timestamp()"
    assert (
        tsql_compat.translate("LEN([First Name])") == "length(rtrim(`First Name`))"
    )
    assert tsql_compat.translate("ISNULL(a, b)") == "coalesce(a, b)"


def test_sql_function_raw_rendering(spark):
    # None → NULL, bools → TRUE/FALSE, embedded quotes doubled
    spec = SqlFunction("coalesce", raws=[None, "it's"])
    df = spark.range(1).select(spec.expr.alias("out"))
    assert df.collect()[0]["out"] == "it's"
    spec2 = SqlFunction("if", raws=[True, "y'es", "n'o"])
    assert spark.range(1).select(spec2.expr.alias("o")).collect()[0]["o"] == "y'es"
