"""Property tests for the T-SQL semantic quirks encoded in C5-C8
(SURVEY.md §7.4): arbitrary strings — including whitespace-only, empty,
and NULL — must match a Python model of the documented T-SQL behavior.
Each property batches all generated inputs into one DataFrame so a run
costs one Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dirty_js_etl_spark.functions.combinators import (
    ConcatColumns,
    CopyOrDefault,
    InvertBit,
    TruncateString,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

texts = st.one_of(
    st.none(),
    st.text(alphabet=" aB3 ", max_size=8),  # spaces interleaved deliberately
)


def _run(spark, rows, spec_expr, schema):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)], schema)
    out = df.select("i", spec_expr.alias("out")).collect()
    return {r["i"]: r["out"] for r in out}


@given(vals=st.lists(st.one_of(st.none(), st.integers(0, 3)), max_size=12))
@SETTINGS
def test_invert_bit_model(spark, vals):
    # CASE WHEN c = 1 THEN 0 ELSE 1 END: NULL and non-1 both -> 1
    got = _run(spark, vals, InvertBit("v").expr, "i int, v int")
    for i, v in enumerate(vals):
        assert got[i] == (0 if v == 1 else 1)


@given(vals=st.lists(texts, max_size=12))
@SETTINGS
def test_copy_or_default_model(spark, vals):
    # empty-or-NULL -> default; T-SQL LEN ignores trailing spaces, so
    # whitespace-only counts as empty
    got = _run(spark, vals, CopyOrDefault("v", "DFLT").expr, "i int, v string")
    for i, v in enumerate(vals):
        want = "DFLT" if v is None or len(v.rstrip()) == 0 else v
        assert got[i] == want, (v,)


@given(vals=st.lists(texts, max_size=12), n=st.integers(1, 5))
@SETTINGS
def test_truncate_string_model(spark, vals, n):
    # RTRIM(LEFT(c, n)), then empty -> NULL
    got = _run(spark, vals, TruncateString("v", n).expr, "i int, v string")
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] is None
        else:
            t = v[:n].rstrip()
            assert got[i] == (t if t else None), (v, n)


@given(a=st.lists(texts, max_size=10))
@SETTINGS
def test_concat_columns_model(spark, a):
    # RTRIM(LTRIM(COALESCE(a,'') + ' ' + COALESCE(b,''))): NULLs become
    # empty (not skipped — bare concat_ws would skip them and change
    # spacer placement), interior spacers survive, outer trim only
    rows = [(i, v, "x" if i % 2 else None) for i, v in enumerate(a)]
    df = spark.createDataFrame(rows, "i int, v string, w string")
    spec = ConcatColumns(["v", "w"], spacer=" ")
    got = {
        r["i"]: r["out"] for r in df.select("i", spec.expr.alias("out")).collect()
    }
    for i, v, w in rows:
        want = f"{v or ''} {w or ''}".strip()
        assert got[i] == want, (v, w)
