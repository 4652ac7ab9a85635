"""Hopping-window membership: the offset identity used by the oracle
must equal interval recounts, including sub-second boundary events."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.plans.events import hopping_halfhour_stats


def test_every_event_lands_in_exactly_two_windows(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(seconds=s), "t", 1.0)
        for i, s in enumerate(
            [0, 1, 1799, 1800, 1801, 3599, 3600, 5399, 5400, 7199]
        )
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = hopping_halfhour_stats(events).collect()
    assert sum(r["n_events"] for r in out) == 2 * len(rows)


def test_window_membership_matches_interval_recount(spark):
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    # Sub-second offsets around the :30 boundary — the case a
    # seconds-rounding oracle got wrong (epoch() is fractional; the SQL
    # restatement must use integer microseconds).
    offsets = [1799.4, 1799.6, 1800.0, 1800.4, 899.9, 2700.5]
    rows = [
        (i, base + dt.timedelta(seconds=s), "t", 1.0) for i, s in enumerate(offsets)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["window_start"], r["n_events"])
        for r in hopping_halfhour_stats(events).collect()
    }
    # independent recount: a window [w, w+1h) holds events with w <= ts < w+1h
    starts = {
        base + dt.timedelta(seconds=1800 * k) for k in range(-2, 4)
    }
    want = set()
    for w in starts:
        n = sum(1 for _, ts, _, _ in rows if w <= ts < w + dt.timedelta(hours=1))
        if n:
            want.add((w, n))
    assert got == want
