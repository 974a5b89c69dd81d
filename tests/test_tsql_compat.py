"""T-SQL → Spark SQL alias shim: the spellings the reference's own
mappings/docs use must port verbatim."""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.functions.tsql_compat import translate


def test_bracket_identifiers():
    assert translate("[orig_id] IS NOT NULL") == "`orig_id` IS NOT NULL"
    assert translate("D.[user name] = 1") == "D.`user name` = 1"


def test_function_aliases_case_insensitive():
    assert translate("GETDATE()") == "current_timestamp()"
    assert translate("getdate()") == "current_timestamp()"
    assert translate("LEN(x) > 0") == "length(rtrim(x)) > 0"
    assert translate("ISNULL(a, b)") == "coalesce(a, b)"
    # T-SQL CHARINDEX(find, search) keeps its argument order under
    # Spark position(find, search); instr would swap needle/haystack.
    assert translate("CHARINDEX('a', s)") == "position('a', s)"


def test_untranslated_passthrough():
    sql = "o_totalprice > 100 AND o_orderstatus = 'O'"
    assert translate(sql) == sql


def test_no_false_positives_inside_words():
    # LENGTH already spark; 'challenge(' contains LEN but not as a word
    assert translate("challenge(x)") == "challenge(x)"
    assert translate("length(x)") == "length(x)"


def test_len_trailing_space_rule():
    # T-SQL LEN ignores trailing spaces: LEN('a  ') = 1
    assert translate("LEN('a  ')") == "length(rtrim('a  '))"
    # nested parens and quoted parens/escapes stay balanced
    assert (
        translate("LEN(concat(a, ')((', 'it''s'))")
        == "length(rtrim(concat(a, ')((', 'it''s')))"
    )
    assert translate("LEN(a) + LEN(b)") == "length(rtrim(a)) + length(rtrim(b))"


def test_translated_predicate_runs(spark):
    df = spark.range(3).select(F.col("id").alias("orig_id"))
    out = df.filter(
        F.expr(
            translate(
                "[orig_id] IS NOT NULL AND LEN('ab  ') = 2"
                " AND CHARINDEX('b', 'ab') = 2"
            )
        )
    )
    assert out.count() == 3
