"""Streaming SCD2 (streaming/scd.py): multi-batch incremental apply
must reproduce the batch scd2_history answer under the in-order CDC
contract; the full drained stream equals the batch build."""

from __future__ import annotations

from pyspark.sql import functions as F

from dirty_js_etl_spark.operators.scd import scd2_history
from dirty_js_etl_spark.streaming.scd import StreamingScd2


def _purchases(catalog):
    return catalog.read("events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "value", "event_id")


def _normalize(df):
    return sorted(
        (r["user_id"], r["value"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in df.collect()
    )


def test_three_ordered_batches_converge_to_batch_history(spark, catalog):
    p = _purchases(catalog)
    # deterministic ts cuts: split the month into thirds
    b1 = p.filter(F.col("ts") < "2024-01-11")
    b2 = p.filter((F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21"))
    b3 = p.filter(F.col("ts") >= "2024-01-21")
    state = StreamingScd2("user_id", "ts", ["value"], tie_break="event_id")
    for b in (b1, b2, b3):
        state.apply_batch(b)
    assert state.batches == 3
    expected = scd2_history(p, "user_id", "ts", ["value"], tie_break="event_id")
    assert _normalize(state.history) == _normalize(expected)


def test_single_batch_equals_batch_build(spark, catalog):
    p = _purchases(catalog)
    state = StreamingScd2("user_id", "ts", ["value"], tie_break="event_id")
    state.apply_batch(p)
    expected = scd2_history(p, "user_id", "ts", ["value"], tie_break="event_id")
    assert _normalize(state.history) == _normalize(expected)


def test_empty_batch_is_noop(spark, catalog):
    p = _purchases(catalog)
    state = StreamingScd2("user_id", "ts", ["value"], tie_break="event_id")
    state.apply_batch(p.filter(F.lit(False)))
    assert state.history is None and state.batches == 0


def test_new_key_in_later_batch(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    import datetime as dt

    t = lambda d: dt.datetime(2024, 1, d)
    state = StreamingScd2("user_id", "ts", ["value"], tie_break="event_id")
    state.apply_batch(mk([(1, t(1), 10.0, 100)]))
    state.apply_batch(mk([(1, t(5), 11.0, 200), (2, t(6), 99.0, 201)]))
    got = {
        (r["user_id"], r["version"]): (r["value"], r["valid_to"], r["is_current"])
        for r in state.history.collect()
    }
    assert got[(1, 1)] == (10.0, t(5), False)
    assert got[(1, 2)] == (11.0, None, True)
    assert got[(2, 1)] == (99.0, None, True)
