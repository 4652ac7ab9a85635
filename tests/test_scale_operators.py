"""Scale operators: salted aggregation equivalence, bucketed no-shuffle joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.skew import salted_agg
from export_oltp_to_olap_spark.sources.bucketed import read_bucketed, write_bucketed
from export_oltp_to_olap_spark.sources.parquet import load_tables

SRC = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_equals_plain_groupby(spark):
    """Salting must be result-invariant — same aggregates as plain
    groupBy on a genuinely skewed key (event_type: 5 values, ~200 rows
    each)."""
    events = load_tables(spark, SRC, ("events",))["events"]
    plain = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    salted = salted_agg(
        events,
        ["event_type"],
        [("count", F.lit(1), "n"), ("min", "value", "lo"), ("max", "value", "hi")],
        n_salts=8,
    )
    assert _rows(salted.select("event_type", "n", "lo", "hi")) == _rows(plain)


def test_salted_agg_rejects_non_algebraic(spark):
    events = load_tables(spark, SRC, ("events",))["events"]
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(events, ["event_type"], [("avg", "value", "a")])


def test_salted_agg_spreads_hot_key(spark):
    """The first stage must actually fan a single key out over salts."""
    events = load_tables(spark, SRC, ("events",))["events"]
    one_key = events.where(F.col("event_type") == "click")
    salted = one_key.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
    n_salts_used = salted.select("__salt").distinct().count()
    assert n_salts_used >= 4, "hot key not spread across salt buckets"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT a shuffle —
    the plan must contain no Exchange above either scan."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        tables = load_tables(spark, SRC, ("orders", "lineitem"))
        write_bucketed(
            tables["lineitem"].select("l_orderkey", "l_quantity"),
            "t_lineitem_bkt",
            ["l_orderkey"],
            n_buckets=8,
            sort_keys=["l_orderkey"],
        )
        write_bucketed(
            tables["orders"].select("o_orderkey", "o_totalprice"),
            "t_orders_bkt",
            ["o_orderkey"],
            n_buckets=8,
            sort_keys=["o_orderkey"],
        )
        li = read_bucketed(spark, "t_lineitem_bkt")
        orders = read_bucketed(spark, "t_orders_bkt")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and the result is right
        expected = (
            tables["lineitem"]
            .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")


def test_approx_distinct_error_bound(spark, sf001):
    """approx_count_distinct (HLL++, default rsd 0.05) must land within
    5x its nominal relative error of the exact count — the bound the
    registration docstring promises."""
    from export_oltp_to_olap_spark.plans.analytic import approx_distinct_parts
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    tables = load_tables(spark, sf001, ("lineitem",))
    for r in approx_distinct_parts(tables).collect():
        rel_err = abs(r["approx_parts"] - r["exact_parts"]) / r["exact_parts"]
        assert rel_err <= 0.25, (
            f"{r['l_returnflag']}: approx {r['approx_parts']} vs exact "
            f"{r['exact_parts']} (rel err {rel_err:.3f})"
        )


def test_approx_percentile_rank_error_bound(spark, sf001):
    """percentile_approx at accuracy 10000 bounds RANK error by 1/10000;
    translate to value space by checking the sketch value sits between
    the exact values at p ± 10x the nominal rank error."""
    from export_oltp_to_olap_spark.plans.analytic import approx_percentiles_orders
    from export_oltp_to_olap_spark.sources.parquet import load_tables
    from pyspark.sql import functions as F

    tables = load_tables(spark, sf001, ("orders",))
    eps = 10.0 / 10000
    bounds = tables["orders"].groupBy("o_orderpriority").agg(
        *[
            F.expr(f"percentile(o_totalprice, {q})").alias(n)
            for q, n in [
                (0.5 - eps, "lo50"),
                (0.5 + eps, "hi50"),
                (0.99 - eps, "lo99"),
                (min(0.99 + eps, 1.0), "hi99"),
            ]
        ]
    )
    got = {r["o_orderpriority"]: r for r in approx_percentiles_orders(tables).collect()}
    for b in bounds.collect():
        r = got[b["o_orderpriority"]]
        assert b["lo50"] <= r["approx_p50"] <= b["hi50"], r
        assert b["lo99"] <= r["approx_p99"] <= b["hi99"], r


def test_stats_moments_match_numpy(spark, sf001):
    """The decimal power-sum derivation must agree with an independent
    (numpy) computation of the same population statistics."""
    import numpy as np

    from export_oltp_to_olap_spark.plans.analytic import stats_moments_lineitem
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    tables = load_tables(spark, sf001, ("lineitem",))
    got = {r["l_returnflag"]: r for r in stats_moments_lineitem(tables).collect()}
    rows = tables["lineitem"].select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append((r["l_quantity"], r["l_extendedprice"]))
    for flag, pairs in by_flag.items():
        x = np.array([p[0] for p in pairs], dtype=np.float64)
        y = np.array([p[1] for p in pairs], dtype=np.float64)
        g = got[flag]
        assert g["n"] == len(pairs)
        assert abs(g["mean_qty"] - x.mean()) < 1e-4
        assert abs(g["stddev_qty"] - x.std()) < 1e-4
        assert abs(g["corr_qty_price"] - np.corrcoef(x, y)[0, 1]) < 1e-4
