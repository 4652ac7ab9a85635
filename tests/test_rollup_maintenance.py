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


def test_distinct_rollup_any_slicing_equals_full_recompute(spark, sf001):
    """HLL register union is lossless for fixed lgK: incremental sketch
    maintenance ESTIMATES equal the full-recompute estimates exactly,
    for any batch slicing and merge order."""
    from export_oltp_to_olap_spark.streaming.rollup import (
        distinct_rollup_partials,
        distinct_rollup_report,
        merge_distinct_rollup,
    )

    events = load_tables(spark, sf001, ("events",))["events"]
    full = distinct_rollup_report(distinct_rollup_partials(events))

    b1 = events.where(F.col("event_id") % 5 < 1)
    b2 = events.where((F.col("event_id") % 5 >= 1) & (F.col("event_id") % 5 < 4))
    b3 = events.where(F.col("event_id") % 5 >= 4)

    state = distinct_rollup_partials(b1)
    state = merge_distinct_rollup(state, distinct_rollup_partials(b2))
    state = merge_distinct_rollup(state, distinct_rollup_partials(b3))
    assert _canon(distinct_rollup_report(state)) == _canon(full)

    state_rev = distinct_rollup_partials(b3)
    state_rev = merge_distinct_rollup(state_rev, distinct_rollup_partials(b1))
    state_rev = merge_distinct_rollup(state_rev, distinct_rollup_partials(b2))
    assert _canon(distinct_rollup_report(state_rev)) == _canon(full)


def test_distinct_rollup_estimates_within_hll_error(spark, sf001):
    from export_oltp_to_olap_spark.streaming.rollup import (
        distinct_rollup_partials,
        distinct_rollup_report,
    )

    events = load_tables(spark, sf001, ("events",))["events"]
    est = {
        (r["bucket_start"], r["event_type"]): r["approx_distinct_users"]
        for r in distinct_rollup_report(distinct_rollup_partials(events)).collect()
    }
    exact = {
        (r["bucket_start"], r["event_type"]): r["n"]
        for r in events.groupBy(
            F.window("ts", "1 hour")["start"].alias("bucket_start"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.05 * e), (k, est[k], e)


def test_distinct_rollup_state_is_fixed_size(spark, sf001):
    """State per key is one bounded binary sketch — never a user set."""
    from export_oltp_to_olap_spark.streaming.rollup import (
        distinct_rollup_partials,
    )

    events = load_tables(spark, sf001, ("events",))["events"]
    state = distinct_rollup_partials(events)
    assert dict(state.dtypes)["user_sketch"] == "binary"
    sizes = [len(r["user_sketch"]) for r in state.collect()]
    assert max(sizes) <= 3000  # lgK=12 HLL_4 upper bound (~2.5 KB)
