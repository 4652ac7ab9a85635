"""Unit semantics of the union-tag as-of join (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.asof import asof_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "L10"),  # matches right at ts=5
            (1, _ts(20), "L20"),  # matches right at ts=20 (inclusive tie)
            (1, _ts(3), "L3"),    # before any right row -> null
            (2, _ts(10), "M10"),  # key 2: right rows of key 1 must not leak
        ],
        "k long, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), "R5"),
            (1, _ts(20), "R20"),
            (1, _ts(25), "R25"),  # in the future of every left row
        ],
        "k long, ts timestamp, rval string",
    )
    out = {
        r["lval"]: r["r_rval"]
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rval"]
        ).collect()
    }
    assert out == {"L10": "R5", "L20": "R20", "L3": None, "M10": None}


def test_asof_join_null_ts_rows(spark):
    """A right row with NULL ts can never match (`right.ts <= left.ts` is
    never true for NULL) — it must not be carried into left rows just
    because NULLs sort first.  A left row with NULL ts matches nothing."""
    left = spark.createDataFrame(
        [(1, _ts(10), "L10"), (1, None, "Lnull")],
        "k long, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [(1, None, "Rnull"), (1, _ts(5), "R5")],
        "k long, ts timestamp, rval string",
    )
    out = {
        r["lval"]: r["r_rval"]
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rval"]
        ).collect()
    }
    assert out == {"L10": "R5", "Lnull": None}


def test_asof_join_matches_naive_range_join(spark, sf001):
    """The one-shuffle union-tag plan equals the quadratic range-join
    definition on real data."""
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    events = load_tables(spark, sf001, ("events",))["events"]
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("cid")
    )
    fast = {
        r["pid"]: r["r_cid"]
        for r in asof_join(
            purchases, clicks, on=["user_id"], ts_col="ts", right_cols=["cid"]
        ).collect()
    }
    from pyspark.sql import Window

    clicks_r = clicks.select("user_id", F.col("ts").alias("cts"), "cid")
    w = Window.partitionBy("pid").orderBy(F.col("cts").desc())
    naive_df = (
        purchases.join(clicks_r, "user_id", "left")
        .where(F.col("cts") <= F.col("ts"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("pid", "cid")
    )
    naive = {r["pid"]: r["cid"] for r in naive_df.collect()}
    # naive drops no-match purchases entirely; fast keeps them as null
    assert {p: c for p, c in fast.items() if c is not None} == naive
    assert set(fast) == {r["pid"] for r in purchases.collect()}


def test_asof_join_matches_python_model_on_generated_cases(spark):
    """Property test: the union-tag plan equals a direct python model of
    'latest right.ts <= left.ts per key' over generated edge cases —
    NULL timestamps, equal timestamps, empty sides, singleton keys.
    Matched TIMESTAMPS are compared (payload choice among equal-ts right
    rows is tied, hence unspecified)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ts = st.one_of(st.none(), st.integers(min_value=0, max_value=6))
    rows = st.lists(st.tuples(st.integers(1, 2), ts), min_size=0, max_size=6)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(left_rows=rows, right_rows=rows)
    def check(left_rows, right_rows):
        left = spark.createDataFrame(
            [(i, k, _ts(t) if t is not None else None)
             for i, (k, t) in enumerate(left_rows)],
            "lid long, k long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(k, _ts(t) if t is not None else None, 100 + i)
             for i, (k, t) in enumerate(right_rows)],
            "k long, ts timestamp, rid long",
        )
        if not left_rows:
            return  # empty left: nothing to assert (schema-only result)
        got = {
            r["lid"]: r["r_ts"]
            for r in asof_join(
                left, right, on=["k"], ts_col="ts", right_cols=["rid", "ts"]
            ).collect()
        }
        for i, (k, t) in enumerate(left_rows):
            if t is None:
                want = None
            else:
                cands = [rt for rk, rt in right_rows if rk == k and rt is not None and rt <= t]
                want = max(cands) if cands else None
            assert got[i] == (_ts(want) if want is not None else None), (
                f"left row {i} (k={k}, ts={t}): matched {got[i]}, want {want}"
            )

    check()
