"""Stateful streaming sessionization (applyInPandasWithState): must equal
the batch sessionizer on the drained fixture stream, including when the
input is split across micro-batches (state carries the open session)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.events import session_stats
from dirty_js_etl_spark.streaming.sessions import (
    latest_sessions,
    run_sessionize_stream,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_sessions(spark, sf_dir):
    from dirty_js_etl_spark.catalog import fixture_catalog

    return session_stats(fixture_catalog(spark, sf_dir).read("events"))


def test_stream_matches_batch_single_batch(spark):
    got = run_sessionize_stream(spark, SF_DIR, query_name="t_sess_single")
    want = _batch_sessions(spark, SF_DIR)
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()


def test_stream_matches_batch_across_batches(spark, tmp_path):
    """Split the fixture by global ts order into two files; with
    maxFilesPerTrigger=1 each becomes its own micro-batch, so sessions
    spanning the cut only survive via state."""
    from dirty_js_etl_spark.catalog import fixture_catalog

    events = fixture_catalog(spark, SF_DIR).read("events")
    cutoff = events.approxQuantile("value", [0.5], 0.0)  # noqa: F841 (warm)
    ordered = events.orderBy("ts", "event_id")
    n = ordered.count()
    first = ordered.limit(n // 2)
    second = ordered.subtract(first)
    src = os.path.join(tmp_path, "events_split")
    # one file per half, written oldest-first so arrival order == ts order
    first.coalesce(1).write.parquet(os.path.join(src, "a"))
    second.coalesce(1).write.parquet(os.path.join(src, "b"))

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*/part-*.parquet")
    )
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_sess_split")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = latest_sessions(spark.table("t_sess_split"))
    want = _batch_sessions(spark, SF_DIR)
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()


def test_state_bounded_to_open_sessions(spark):
    """Update-mode re-emissions collapse: final sessions are unique by
    session_id and counts sum to the event count."""
    got = run_sessionize_stream(spark, SF_DIR, query_name="t_sess_bounds")
    assert got.groupBy("session_id").count().filter("count > 1").isEmpty()
    total = got.agg(F.sum("n_events")).collect()[0][0]
    from dirty_js_etl_spark.catalog import fixture_catalog

    assert total == fixture_catalog(spark, SF_DIR).read("events").count()
