"""Skew mitigation: salted two-stage aggregation + hot-key split join.

AQE's skew-join splitting handles skewed JOINS automatically
(session.py), but a skewed GROUP BY key still funnels one key's rows into
one reducer.  For algebraic aggregates (sum/count/min/max — anything with
a partial form) the fix is salting: aggregate on (key, salt) first so the
hot key spreads over N reducers, then combine the N partials.

Spark already does map-side partial aggregation, which usually suffices;
salting matters when a single key's PARTIAL rows still overwhelm one
reducer (billions of rows per key at 100 TB, or high-cardinality
distinct-ish state per key).  The helper keeps the algebra explicit so
the two stages compose correctly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (first-stage fn, combine fn) per algebraic aggregate
_ALGEBRA = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str | Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with hot keys spread over ``n_salts`` reducers.

    ``aggs`` is a list of ``(fn, col, alias)`` with fn in
    sum/count/min/max.  Result is identical to
    ``df.groupBy(*keys).agg(...)`` — verified by tests — but the first
    shuffle hashes on (keys, salt), so no reducer sees more than ~1/n of
    any key.
    """
    unknown = [fn for fn, _, _ in aggs if fn not in _ALGEBRA]
    if unknown:
        raise ValueError(f"non-algebraic aggregates not saltable: {unknown}")

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRA[fn][0](F.col(c) if isinstance(c, str) else c).alias(f"__p_{alias}")
            for fn, c, alias in aggs
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[_ALGEBRA[fn][1](f"__p_{alias}").alias(alias) for fn, _, alias in aggs]
    )


# ---------------------------------------------------------------------------
# Hot-key split join
# ---------------------------------------------------------------------------


def hot_keys(df: DataFrame, key: str, threshold_rows: int, cap: int = 1024) -> DataFrame:
    """Keys whose row count exceeds ``threshold_rows`` — the candidates
    that would overwhelm single reducers in a shuffle join.

    One partial-aggregated count shuffle; the result is capped (a table
    with more than ``cap`` hot keys means the threshold is mis-set, not
    that the driver should broadcast a million keys) and ordered
    deterministically (count desc, key asc).
    """
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > threshold_rows)
        .orderBy(F.col("__n").desc(), F.col(key).asc())
        .limit(cap)
        .select(key)
    )


def hotkey_split_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    threshold_rows: int = 1_000_000,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Inner join equal to ``left.join(right, key)`` with hot keys routed
    around the shuffle.

    AQE's skew-join split (enabled in session.py) only rescues SORT-MERGE
    joins whose oversized partitions it can subdivide; it cannot help
    when a single key's rows must still meet on one node (e.g. the
    follow-up aggregation pins partitioning) or when AQE is off.  This is
    the explicit production form ("differentiated join"):

    * rows whose key is in the hot set (``hot_keys`` by default) join via
      BROADCAST of the right side's hot-key slice — the hot key never
      shuffles at all, every left partition resolves it locally;
    * the remaining (cold, by construction un-skewed) rows take the
      normal shuffle join;
    * results union.  Row multiplicity is preserved exactly — the split
      is a partition of the key space.

    The hot set itself is computed with one count shuffle of ``left``
    (the side skew lives on) and broadcast everywhere it is used.
    """
    hot = hot if hot is not None else hot_keys(left, key, threshold_rows)
    hot = F.broadcast(hot.select(key).distinct())

    left_hot = left.join(hot, key, "left_semi")
    left_cold = left.join(hot, key, "left_anti")
    right_hot = right.join(hot, key, "left_semi")

    hot_joined = left_hot.join(F.broadcast(right_hot), key, "inner")
    cold_joined = left_cold.join(right, key, "inner")
    return hot_joined.unionByName(cold_joined)


# ---------------------------------------------------------------------------
# Fixture face — hot-key-routed orders⋈customer with a plain-join oracle:
# the oracle IS the equivalence claim (split join ≡ ordinary join).
# ---------------------------------------------------------------------------

HOT_ORDER_THRESHOLD = 15  # fixture orders/customer averages ~10; >15 = "hot"


def skew_safe_join_revenue(orders: DataFrame, customer: DataFrame) -> DataFrame:
    from export_oltp_to_olap_spark.plans.flagship import exact_sum

    joined = hotkey_split_join(
        orders.select(F.col("o_custkey").alias("custkey"), "o_totalprice"),
        customer.select(F.col("c_custkey").alias("custkey"), "c_mktsegment"),
        "custkey",
        threshold_rows=HOT_ORDER_THRESHOLD,
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


SKEW_SAFE_JOIN_SQL = """
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""".strip()
