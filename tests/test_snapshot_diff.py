"""snapshot_diff contracts: status classification, null-safe change
detection, changed_cols accounting, surviving-value selection, and the
fixture face's drift census."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import diff


@pytest.fixture(scope="module")
def snapshots(spark):
    a = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4, 5],
                "x": [10, 20, 30, None, 50],
                "y": ["a", "b", "c", "d", "e"],
            }
        )
    )
    b = spark.createDataFrame(
        pd.DataFrame(
            {
                # 2 dropped; 6 added; 3 changes x; 4 fills null x; 5 same
                "k": [1, 3, 4, 5, 6],
                "x": [10, 31, 40, 50, 60],
                "y": ["a", "c", "d", "e", "f"],
            }
        )
    )
    return a, b


def test_status_and_changed_cols(snapshots):
    a, b = snapshots
    out = {
        r["k"]: r
        for r in diff.snapshot_diff(a, b, ["k"], ["x", "y"]).collect()
    }
    assert set(out) == {2, 3, 4, 6}  # 1 and 5 are identical → absent
    assert out[2]["status"] == "removed" and out[2]["changed_cols"] == ""
    assert out[3]["status"] == "changed" and out[3]["changed_cols"] == "x"
    assert out[4]["status"] == "changed" and out[4]["changed_cols"] == "x"  # null→40
    assert out[6]["status"] == "added" and out[6]["changed_cols"] == ""


def test_surviving_values_pick_correct_side(snapshots):
    a, b = snapshots
    out = {
        r["k"]: r
        for r in diff.snapshot_diff(a, b, ["k"], ["x", "y"]).collect()
    }
    assert out[2]["x"] == 20 and out[2]["y"] == "b"  # removed → A's values
    assert out[3]["x"] == 31  # changed → B's values
    assert out[6]["x"] == 60  # added → B's values


def test_default_compare_cols_are_shared_non_keys(snapshots):
    a, b = snapshots
    explicit = diff.snapshot_diff(a, b, ["k"], ["x", "y"]).collect()
    inferred = diff.snapshot_diff(a, b, ["k"]).collect()
    assert sorted(map(tuple, inferred)) == sorted(map(tuple, explicit))


def test_multi_column_change_lists_in_compare_order(spark):
    a = spark.createDataFrame([(1, 1, "p")], "k long, x long, y string")
    b = spark.createDataFrame([(1, 2, "q")], "k long, x long, y string")
    (row,) = diff.snapshot_diff(a, b, ["k"], ["x", "y"]).collect()
    assert row["status"] == "changed" and row["changed_cols"] == "x,y"


def test_all_null_payload_rows_classified_by_presence(spark):
    a = spark.createDataFrame([(1, None)], "k long, x string")
    b = spark.createDataFrame([(2, None)], "k long, x string")
    out = {r["k"]: r["status"] for r in diff.snapshot_diff(a, b, ["k"], ["x"]).collect()}
    assert out == {1: "removed", 2: "added"}


def test_fixture_face_census(spark):
    cust = spark.range(1, 501).select(
        F.col("id").alias("c_custkey"),
        (F.col("id") % 40).cast("int").alias("c_nationkey"),
        (F.col("id") * 1.5).alias("c_acctbal"),
        F.concat(F.lit("seg"), (F.col("id") % 5)).alias("c_mktsegment"),
    )
    out = diff.snapshot_diff_customers(cust).toPandas()
    removed = {k for k in range(1, 501) if k % 89 == 0}
    added = {k + 1_000_000 for k in range(1, 501) if k % 101 == 0}
    changed = {
        k for k in range(1, 501) if (k % 97 == 0 or k % 61 == 0) and k % 89 != 0
    }
    assert set(out[out.status == "removed"]["c_custkey"]) == removed
    assert set(out[out.status == "added"]["c_custkey"]) == added
    assert set(out[out.status == "changed"]["c_custkey"]) == changed
    assert list(out["c_custkey"]) == sorted(out["c_custkey"])  # ordered output


def test_diff_summary_census(snapshots):
    a, b = snapshots
    d = diff.snapshot_diff(a, b, ["k"], ["x", "y"])
    out = {r["status"]: r["n_rows"] for r in diff.diff_summary(d).collect()}
    assert out == {"added": 1, "removed": 1, "changed": 2}


def test_apply_diff_roundtrip(snapshots):
    a, b = snapshots
    d = diff.snapshot_diff(a, b, ["k"], ["x", "y"])
    rebuilt = diff.apply_diff(a, d, ["k"], ["x", "y"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, b.select("k", "x", "y").collect())
    )


def test_apply_diff_roundtrip_randomized(spark):
    """Property: for randomized snapshot pairs (draws seeded, so
    reproducible), apply(a, diff(a,b)) == b exactly — including
    all-null payloads, disjoint keys, and identical tables."""
    import random

    rng = random.Random(20240)
    for trial in range(6):
        keys_a = rng.sample(range(40), rng.randint(0, 25))
        keys_b = rng.sample(range(40), rng.randint(0, 25))

        def payload(k, side):
            if rng.random() < 0.15:
                return None
            if rng.random() < 0.5:
                return k * 10  # same value both sides sometimes
            return k * 10 + (1 if side == "b" and rng.random() < 0.5 else 0)

        a = spark.createDataFrame(
            [(k, payload(k, "a")) for k in keys_a] or [(None, None)],
            "k long, x long",
        ).where(F.col("k").isNotNull())
        b = spark.createDataFrame(
            [(k, payload(k, "b")) for k in keys_b] or [(None, None)],
            "k long, x long",
        ).where(F.col("k").isNotNull())
        d = diff.snapshot_diff(a, b, ["k"], ["x"])
        rebuilt = diff.apply_diff(a, d, ["k"], ["x"])
        assert sorted(map(tuple, rebuilt.collect())) == sorted(
            map(tuple, b.collect())
        ), f"trial {trial}"
