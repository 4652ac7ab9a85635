"""Convergence of the incrementally maintained rollup (streaming/rollup.py):
any batch slicing of the stream, merged in any order, equals the full
recompute EXACTLY (integer-cent accumulators, no float drift)."""

from __future__ import annotations

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.sources.parquet import load_tables
from export_oltp_to_olap_spark.streaming.rollup import (
    merge_rollup,
    rollup_partials,
    rollup_report,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_merge_equals_full_recompute(spark, sf001):
    events = load_tables(spark, sf001, ("events",))["events"]
    full = rollup_partials(events)

    # slice the stream into 3 uneven "micro-batches" by event_id ranges
    b1 = events.where(F.col("event_id") % 7 < 2)
    b2 = events.where((F.col("event_id") % 7 >= 2) & (F.col("event_id") % 7 < 3))
    b3 = events.where(F.col("event_id") % 7 >= 3)

    state = rollup_partials(b1)
    state = merge_rollup(state, rollup_partials(b2))
    state = merge_rollup(state, rollup_partials(b3))
    assert _canon(state) == _canon(full)

    # merge order must not matter (commutativity)
    state_rev = rollup_partials(b3)
    state_rev = merge_rollup(state_rev, rollup_partials(b1))
    state_rev = merge_rollup(state_rev, rollup_partials(b2))
    assert _canon(state_rev) == _canon(full)


def test_report_derives_consistent_averages(spark, sf001):
    events = load_tables(spark, sf001, ("events",))["events"]
    report = rollup_report(rollup_partials(events))
    for r in report.collect():
        assert abs(r["avg_value"] * r["n_events"] - r["total_value"]) < 1e-6
        assert r["min_value"] <= r["avg_value"] <= r["max_value"]
