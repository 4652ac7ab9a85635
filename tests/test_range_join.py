"""Unit semantics of the bucketed interval join (operators/rangejoin.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.rangejoin import interval_join


def _ts(s: float):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=s)


def test_interval_join_boundaries(spark):
    """Lower bound inclusive, upper bound exclusive, bucket-boundary
    spill (a window straddling two buckets) still matches."""
    left = spark.createDataFrame(
        [(1, _ts(100), "L")], "k long, ts timestamp, lval string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts(90), "at_lower"),       # ts == left+lower -> included
            (1, _ts(99.999999), "inside"),  # just under upper -> included
            (1, _ts(100), "at_upper"),      # ts == left+upper -> excluded
            (1, _ts(89.999999), "below"),   # just under lower -> excluded
            (2, _ts(95), "other_key"),      # key mismatch -> excluded
        ],
        "k long, ts timestamp, tag string",
    )
    got = {
        r["r_tag"]
        for r in interval_join(
            left,
            right,
            on=["k"],
            ts_col="ts",
            lower_us=-10_000_000,
            upper_us=0,
            right_cols=["tag"],
        ).collect()
    }
    assert got == {"at_lower", "inside"}


def test_interval_join_matches_naive_theta_join(spark, sf001):
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    events = load_tables(spark, sf001, ("events",))["events"]
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    fast = {
        (r["pid"], r["r_cid"])
        for r in interval_join(
            purchases,
            clicks.select("user_id", F.col("cts").alias("ts"), "cid"),
            on=["user_id"],
            ts_col="ts",
            lower_us=-3_600_000_000,
            upper_us=0,
            right_cols=["cid"],
        ).collect()
    }
    naive = {
        (r["pid"], r["cid"])
        for r in purchases.join(clicks, "user_id")
        .where(
            (F.unix_micros("cts") >= F.unix_micros("ts") - 3_600_000_000)
            & (F.unix_micros("cts") < F.unix_micros("ts"))
        )
        .collect()
    }
    assert fast == naive and len(fast) > 0
