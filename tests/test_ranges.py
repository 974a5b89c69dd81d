"""Range join: boundary inclusivity, multi-bucket intervals, no
nested-loop plan, cross-check against the as-of assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.ranges import range_join


@pytest.fixture(scope="module")
def intervals(spark):
    # (key, start, end, tag) as timestamps; 'long' spans many 1h buckets
    rows = [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:59:59", "early"),
        (1, "2024-01-01 05:00:00", "2024-01-01 12:00:00", "long"),
        (2, "2024-01-01 00:30:00", "2024-01-01 00:30:00", "point"),
    ]
    return spark.createDataFrame(
        rows, "k int, start string, end string, tag string"
    ).select(
        "k",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
        "tag",
    )


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00"),  # == early.start (inclusive)
        (2, 1, "2024-01-01 00:59:59"),  # == early.end (inclusive)
        (3, 1, "2024-01-01 01:30:00"),  # gap -> no match
        (4, 1, "2024-01-01 11:59:00"),  # deep inside 'long'
        (5, 2, "2024-01-01 00:30:00"),  # zero-length interval
        (6, 2, "2024-01-01 00:31:00"),  # just after -> no match
    ]
    return spark.createDataFrame(rows, "pid int, k int, t string").select(
        "pid", "k", F.col("t").cast("timestamp").alias("t")
    )


def test_inclusive_bounds_and_gaps(spark, points, intervals):
    out = range_join(points, intervals, on="k", left_time="t",
                     start_col="start", end_col="end")
    got = {r["pid"]: r["tag"] for r in out.collect()}
    assert got == {1: "early", 2: "early", 4: "long", 5: "point"}


def test_clash_rejected(spark, points):
    bad = points.withColumnRenamed("pid", "start").withColumnRenamed("t", "end")
    with pytest.raises(Exception):
        range_join(points, bad, on="k", left_time="t",
                   start_col="start", end_col="end").collect()


def test_matches_asof_on_sessions(spark, catalog):
    """Disjoint per-user session intervals: range assignment must equal
    the as-of assignment for every event."""
    from dirty_js_etl_spark.operators.asof import asof_join
    from dirty_js_etl_spark.operators.events import session_stats

    events = catalog.read("events").select("event_id", "user_id", "ts")
    sessions = session_stats(catalog.read("events"), gap_minutes=30)
    rj = range_join(
        events, sessions.select("user_id", "session_start", "session_end", "session_id"),
        on="user_id", left_time="ts",
        start_col="session_start", end_col="session_end",
    ).select("event_id", "session_id")
    aj = asof_join(
        events, sessions.select("user_id", "session_start", "session_id"),
        on="user_id", left_time="ts", right_time="session_start",
        payload_cols=["session_id"],
    ).select("event_id", "session_id")
    assert rj.exceptAll(aj).isEmpty() and aj.exceptAll(rj).isEmpty()


def test_no_nested_loop(spark, points, intervals):
    plan = (
        range_join(points, intervals, on="k", left_time="t",
                   start_col="start", end_col="end")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Interval × interval overlap join
# ---------------------------------------------------------------------------


def test_interval_overlap_semantics(spark):
    from dirty_js_etl_spark.operators.ranges import interval_overlap_join
    import datetime as dt

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    left = spark.createDataFrame(
        [
            (1, t(1, 0), t(3, 30)),   # spans 3 hour-buckets
            (2, t(5, 0), t(5, 10)),   # inside one bucket
            (3, t(8, 0), t(8, 5)),    # no partner
        ],
        "lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(3, 15), t(4, 0)),  # overlaps 1 (3:15-3:30)
            (20, t(5, 10), t(6, 0)),  # touches 2 at the endpoint
            (30, t(9, 0), t(10, 0)),  # overlaps nothing
        ],
        "rid int, rs timestamp, re timestamp",
    )
    out = interval_overlap_join(
        left, right, on=None,
        left_start="ls", left_end="le",
        right_start="rs", right_end="re",
    )
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    assert pairs == {(1, 10), (2, 20)}


def test_interval_overlap_no_duplicate_pairs(spark):
    from dirty_js_etl_spark.operators.ranges import interval_overlap_join
    import datetime as dt

    # both spans cover the same 5 hour-buckets -> candidate appears 5x,
    # output must have it once
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0), dt.datetime(2024, 1, 1, 4))],
        "lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [(9, dt.datetime(2024, 1, 1, 0), dt.datetime(2024, 1, 1, 4))],
        "rid int, rs timestamp, re timestamp",
    )
    out = interval_overlap_join(
        left, right, on=None,
        left_start="ls", left_end="le",
        right_start="rs", right_end="re",
    )
    assert out.count() == 1
