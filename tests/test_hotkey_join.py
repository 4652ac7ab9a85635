"""hotkey_split_join contracts: exact equivalence to a plain inner join
(multiplicity included), hot-set detection, and the broadcast routing
actually appearing in the physical plan."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # key 7 holds half of all left rows; right has 1-2 rows per key.
    left = pd.DataFrame(
        {
            "k": [7] * 500 + list(range(100)) * 5,
            "v": range(1000),
        }
    )
    right = pd.DataFrame(
        {
            "k": list(range(100)) + [7, 50],
            "w": [f"r{i}" for i in range(102)],
        }
    )
    return (
        spark.createDataFrame(left).repartition(8),
        spark.createDataFrame(right).repartition(4),
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_split_join_equals_plain_join(skewed):
    left, right = skewed
    plain = left.join(right, "k", "inner")
    split = skew.hotkey_split_join(left, right, "k", threshold_rows=100)
    assert _sorted_rows(split) == _sorted_rows(plain)


def test_split_join_preserves_multiplicity(spark):
    left = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k long, w string")
    plain = left.join(right, "k", "inner")
    split = skew.hotkey_split_join(left, right, "k", threshold_rows=1)
    assert _sorted_rows(split) == _sorted_rows(plain)  # 1 fans out 2×2


def test_empty_hot_set_degenerates_to_plain_join(skewed):
    left, right = skewed
    split = skew.hotkey_split_join(left, right, "k", threshold_rows=10_000)
    assert _sorted_rows(split) == _sorted_rows(left.join(right, "k", "inner"))


def test_hot_key_missing_from_right_still_correct(spark):
    left = spark.createDataFrame([(9, i) for i in range(50)] + [(1, 0)], "k long, v long")
    right = spark.createDataFrame([(1, "x")], "k long, w string")
    split = skew.hotkey_split_join(left, right, "k", threshold_rows=10)
    assert _sorted_rows(split) == [(1, 0, "x")]


def test_hot_keys_threshold_cap_and_order(spark):
    df = spark.createDataFrame(
        [(k, 0) for k in [1] * 30 + [2] * 20 + [3] * 20 + [4] * 5], "k long, v long"
    )
    got = [r["k"] for r in skew.hot_keys(df, "k", threshold_rows=10).collect()]
    assert got == [1, 2, 3]  # count desc, key asc tiebreak; 4 under threshold
    capped = [r["k"] for r in skew.hot_keys(df, "k", threshold_rows=10, cap=2).collect()]
    assert capped == [1, 2]


def test_hot_branch_is_broadcast_in_physical_plan(skewed):
    left, right = skewed
    split = skew.hotkey_split_join(left, right, "k", threshold_rows=100)
    split.collect()
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # hot slice resolves map-side


def test_fixture_face_matches_plain_sql_shape(spark, sf001):
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    t = load_tables(spark, sf001, ("orders", "customer"))
    out = skew.skew_safe_join_revenue(t["orders"], t["customer"])
    plain = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .count()
        .orderBy("c_mktsegment")
    )
    got = out.collect()
    want = plain.collect()
    assert [(r["c_mktsegment"], r["n_orders"]) for r in got] == [
        (r["c_mktsegment"], r["count"]) for r in want
    ]
