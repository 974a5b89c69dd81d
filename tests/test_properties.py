"""Property-based merge semantics (SURVEY.md §5.1 item 3, upgrading the
reference's two-pass probe): for arbitrary dest/source tables with
unique per-side keys —

- idempotency: merge(merge(D,S), S) ≡ merge(D,S)
- audit covers exactly the source rows for a full merge
- result key-set laws for full / insert-only / update-only
- insert-only never changes a matched dest row

Examples are kept small (each runs real Spark jobs); hypothesis drives
the shapes: overlapping/disjoint key sets, empty sides, NULL values.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dirty_js_etl_spark.operators.merge import MergeKey, merge_upsert

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.one_of(st.none(), st.text(alphabet="abc", max_size=3))


def _table(draw_rows: dict[int, str | None]):
    return sorted(draw_rows.items())


tables = st.dictionaries(KEYS, VALS, max_size=6).map(_table)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _frames(spark, dest_rows, src_rows):
    schema = "k int, v string"
    dest = spark.createDataFrame(dest_rows or [], schema)
    src = spark.createDataFrame(src_rows or [], schema)
    return dest, src


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


@given(dest_rows=tables, src_rows=tables)
@SETTINGS
def test_merge_idempotent(spark, dest_rows, src_rows):
    dest, src = _frames(spark, dest_rows, src_rows)
    keys = [MergeKey("k")]
    once = merge_upsert(dest, src, keys).result
    twice = merge_upsert(once, src, keys).result
    assert _rows(once) == _rows(twice)


@given(dest_rows=tables, src_rows=tables)
@SETTINGS
def test_full_merge_audit_covers_source(spark, dest_rows, src_rows):
    dest, src = _frames(spark, dest_rows, src_rows)
    mr = merge_upsert(dest, src, [MergeKey("k")])
    audit = mr.audit.collect()
    assert len(audit) == len(src_rows)
    dest_keys = {k for k, _ in dest_rows}
    for r in audit:
        want = "UPDATE" if r["k"] in dest_keys else "INSERT"
        assert r["_action"] == want


@given(dest_rows=tables, src_rows=tables)
@SETTINGS
def test_key_set_laws(spark, dest_rows, src_rows):
    dest, src = _frames(spark, dest_rows, src_rows)
    keys = [MergeKey("k")]
    dk = {k for k, _ in dest_rows}
    sk = {k for k, _ in src_rows}
    full = merge_upsert(dest, src, keys).result
    assert {r["k"] for r in full.collect()} == dk | sk
    upd = merge_upsert(dest, src, keys, update_only=True).result
    assert {r["k"] for r in upd.collect()} == dk
    ins = merge_upsert(dest, src, keys, insert_only=True).result
    assert {r["k"] for r in ins.collect()} == dk | sk


@given(dest_rows=tables, src_rows=tables)
@SETTINGS
def test_insert_only_preserves_matched_dest(spark, dest_rows, src_rows):
    dest, src = _frames(spark, dest_rows, src_rows)
    out = merge_upsert(dest, src, [MergeKey("k")], insert_only=True).result
    got = dict(_rows(out))
    for k, v in dest_rows:
        assert got[k] == v  # matched rows keep dest values
