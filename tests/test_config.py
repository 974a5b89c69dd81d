"""T17 — BuildConfig deep merge (mappr.js:80-93), options-object
argument coercion (mappr.js:106-114), and the examples/ port of the
reference's shipped users + user_roles scenario."""

from __future__ import annotations

import pytest

from dirty_js_etl_spark.plans.config import BuildConfig, EtlConfig, deep_merge


def test_deep_merge_nested_dicts():
    base = {"modes": {"sqlTest": False, "passes": 1}, "options": {}}
    out = deep_merge(base, {"modes": {"passes": 2}})
    assert out["modes"] == {"sqlTest": False, "passes": 2}
    # inputs untouched
    assert base["modes"]["passes"] == 1


def test_build_config_object_form_merges_defaults():
    cfg = BuildConfig({"modes": {"sqlTest": True}, "options": {"x": 1}})
    assert cfg.modes == {"sqlTest": True, "passes": 1}
    assert cfg.options == {"x": 1}
    assert cfg.databases == {}


def test_build_config_positional_form():
    cfg = BuildConfig("src_db", "dst_db", {"clearPasswords": True})
    assert cfg.databases == {"source": "src_db", "destination": "dst_db"}
    assert cfg.options == {"clearPasswords": True}
    assert cfg.modes == {"sqlTest": False, "passes": 1}


def test_build_config_requires_an_argument():
    with pytest.raises(TypeError):
        BuildConfig()


def test_to_pipeline_carries_modes():
    cfg = BuildConfig({"modes": {"sqlTest": True, "passes": 2}})
    pipe = cfg.to_pipeline()
    assert pipe.dry_run is True and pipe.passes == 2


def test_use_mapping_calls_module_with_config(spark):
    seen = {}

    def mapping(config: EtlConfig, args):
        seen["opt"] = config.options.get("flag")
        seen["args"] = args
        from dirty_js_etl_spark.functions.combinators import DirectCopy
        from dirty_js_etl_spark.plans.mapping import MappingSpec

        return MappingSpec(
            destination="d", source="s", columns={"c": DirectCopy("c")}
        )

    cfg = BuildConfig({"options": {"flag": 7}})
    cfg.use_mapping(mapping, map_arguments={"a": 1})
    assert seen == {"opt": 7, "args": {"a": 1}}
    assert len(cfg.tables) == 1


# -- options-object coercion (the mappr.js string-vs-object idiom) ----------


def _expr_sql(spec):
    return spec.expr._jc.toString()


@pytest.mark.parametrize(
    "positional, object_form",
    [
        (
            lambda C: C.DirectCopy("c_name"),
            lambda C: C.DirectCopy({"sourceColumn": "c_name"}),
        ),
        (
            lambda C: C.CastAs("c_acctbal", "INT"),
            lambda C: C.CastAs({"sourceColumn": "c_acctbal", "type": "INT"}),
        ),
        (
            lambda C: C.RawValue(42),
            lambda C: C.RawValue({"value": 42}),
        ),
        (
            lambda C: C.CaseMap("k", {"a": "1"}, default="z"),
            lambda C: C.CaseMap(
                {"sourceColumn": "k", "map": {"a": "1"}, "default": "z"}
            ),
        ),
        (
            lambda C: C.InvertBit("flag"),
            lambda C: C.InvertBit({"sourceColumn": "flag"}),
        ),
        (
            lambda C: C.TruncateString("s", 5),
            lambda C: C.TruncateString({"sourceColumn": "s", "stringLength": 5}),
        ),
        (
            lambda C: C.ConcatColumns(["a", "b"], spacer="-"),
            lambda C: C.ConcatColumns({"columns": ["a", "b"], "spacer": "-"}),
        ),
        (
            lambda C: C.CopyOrDefault("s", "dflt"),
            lambda C: C.CopyOrDefault({"sourceColumn": "s", "value": "dflt"}),
        ),
        (
            lambda C: C.StaticHash("v", algorithm="md5", encoding="hex"),
            lambda C: C.StaticHash(
                {"value": "v", "algorithm": "md5", "encoding": "hex"}
            ),
        ),
        (
            lambda C: C.AggregateColumn("q", "SUM"),
            lambda C: C.AggregateColumn({"sourceColumn": "q", "aggregate": "SUM"}),
        ),
        (
            lambda C: C.SqlFunction("upper", columns=["s"]),
            lambda C: C.SqlFunction({"name": "upper", "columns": ["s"]}),
        ),
        (
            lambda C: C.Sql("1 + 1", source_column="s"),
            lambda C: C.Sql({"sql": "1 + 1", "sourceColumn": "s"}),
        ),
    ],
)
def test_object_form_equals_positional(spark, positional, object_form):
    import dirty_js_etl_spark.functions.combinators as C

    a, b = positional(C), object_form(C)
    assert _expr_sql(a) == _expr_sql(b)
    assert a.source_columns == b.source_columns
    assert (a.is_column, a.is_columns, a.aggregate) == (
        b.is_column,
        b.is_columns,
        b.aggregate,
    )


def test_merge_on_object_forms(spark):
    from dirty_js_etl_spark.functions.combinators import MergeOn

    col = MergeOn({"sourceColumn": "k"})
    assert col.merge_on.kind == "column" and col.merge_on.source_column == "k"
    val = MergeOn({"value": 5})
    assert val.merge_on.kind == "value" and val.merge_on.value == 5
    # explicit null value selects the IS NULL form (key presence decides)
    nul = MergeOn({"value": None})
    assert nul.merge_on.kind == "null"


def test_foreign_key_object_form(spark):
    from dirty_js_etl_spark.functions.combinators import ForeignKey

    a = ForeignKey("src", "parent", "pcol", "icol", "fcol", 9)
    b = ForeignKey(
        {
            "sourceColumn": "src",
            "parentTable": "parent",
            "parentColumn": "pcol",
            "importColumn": "icol",
            "filterColumn": "fcol",
            "filterValue": 9,
            "parentType": "INT",  # accepted and ignored, as positional
        }
    )
    assert a.lookups == b.lookups


# -- the examples/ port runs end to end -------------------------------------


def test_users_etl_example(spark):
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    import users_etl

    # DirectCopy variant: role user_id is the source username
    res = users_etl.run(spark, role_user_id_via_fk=False)
    roles = {r["orig_user_id"]: r["user_id"] for r in res["user_roles"].result.collect()}
    assert roles == {1: "ada", 2: "alan", 3: "grace"}

    # FK variant (user_roles.js:17-24): resolves through the users table
    # merged earlier in the same run — clearPasswords wipes passwords,
    # usernames flow through users.user_id, so the answer matches but the
    # path exercises the T16 in-run-state contract
    res = users_etl.run(spark, role_user_id_via_fk=True)
    users = {r["orig_id"]: r for r in res["users"].result.collect()}
    assert users[1]["password"] is None  # clearPasswords option applied
    assert users[1]["user_nm"] == "Ada Lovelace"
    assert users[3]["user_nm"] == "Grace"  # NULL-safe concat + trim
    assert users[1]["attr_bits"] == 0 and users[3]["attr_bits"] == 1  # NULL→1
    assert users[1]["user_guid"] == "guid-101"
    assert users[3]["user_guid"] is None  # no individual row: left join
    roles = {r["orig_user_id"]: r["user_id"] for r in res["user_roles"].result.collect()}
    assert roles == {1: "ada", 2: "alan", 3: "grace"}
