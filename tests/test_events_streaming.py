"""Events + streaming tests: JSON extraction, sessionization gap logic,
and the streaming rollup converging to the batch answer."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.events import (
    extract_props,
    hourly_rollup,
    session_stats,
    sessionize,
)
from dirty_js_etl_spark.streaming.events import run_stream_to_memory
from tests.conftest import SF_DIR


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def ev(spark):
    rows = [
        (1, _ts(0), 7, "click", 1.0, '{"k": 5}'),
        (2, _ts(10), 7, "view", 2.0, '{"k": 6}'),
        (3, _ts(50), 7, "click", 3.0, '{"k": 7}'),  # 40min gap -> new session
        (4, _ts(5), 8, "click", 4.0, '{"k": 8}'),
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_extract_props(spark, ev):
    out = extract_props(ev, {"k_val": "k"})
    assert [r["k_val"] for r in out.orderBy("event_id").collect()] == [
        "5", "6", "7", "8",
    ]


def test_sessionize_gap(spark, ev):
    out = sessionize(ev, gap_minutes=30).orderBy("event_id")
    seqs = [(r["user_id"], r["session_seq"]) for r in out.collect()]
    assert seqs == [(7, 1), (7, 1), (7, 2), (8, 1)]


def test_session_stats(spark, ev):
    out = {r["session_id"]: r for r in session_stats(ev, 30).collect()}
    s1 = out[7_000_001]
    assert s1["n_events"] == 2 and s1["total_value"] == 3.0
    assert out[7_000_002]["n_events"] == 1


def test_streaming_rollup_equals_batch(spark, catalog):
    batch = hourly_rollup(catalog.read("events"))
    stream = run_stream_to_memory(spark, SF_DIR, query_name="t_stream_eq")
    diff = batch.exceptAll(stream).count() + stream.exceptAll(batch).count()
    assert diff == 0
    assert stream.count() > 0
