"""Flagship analytic queries over the fixture star (lineitem/orders/...).

These are the headline demonstrations that the OLAP star exists *to be
aggregated* (SURVEY.md §2.D): scan → join chain → derive → aggregate →
sort → limit, exercising the same join shape as the reference's fact
chain (ref sync_oltp_to_olap.py:241-248) at analytic scale.

Determinism for oracle comparison:
* Aggregates over DOUBLE are computed exactly: values are cast to
  DECIMAL (one deterministic rounding), summed exactly, and cast back to
  DOUBLE — so Spark and DuckDB produce bit-identical results regardless
  of summation order.  ``exact_sum`` encapsulates the convention.
* Every ORDER BY ... LIMIT carries a total tiebreak so the kept set is
  unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.measures import revenue

# Decimal shape for exact double aggregation: 10 fractional digits keeps
# the per-value cast faithful; 28 integral+fractional digits leaves 1e18
# of headroom above any fixture sum, and Spark/DuckDB both widen the
# accumulator so the sum itself cannot overflow or round.  The exact sum
# is then rounded to scale 2 BEFORE the cast to DOUBLE: a scale-2 decimal
# below 2^53/100 converts to double with one correctly-rounded division
# in either engine, so the final doubles are bit-identical (a raw
# scale-10 decimal→double conversion differs by 1 ulp between engines).
# ROUND, not a downscale cast: both engines' ROUND(decimal) is
# round-half-away-from-zero, whereas DuckDB's decimal→decimal cast
# truncates (verified empirically: CAST 1.005→1.00 but ROUND 1.005→1.01).
EXACT_DECIMAL = "decimal(28,10)"
EXACT_SUM_SQL = "CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,10))), 2) AS DOUBLE)"


def exact_sum(col: Column | str) -> Column:
    """Order-independent, engine-independent SUM over doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(EXACT_DECIMAL)), 2).cast("double")


def exact_avg(col: Column | str) -> Column:
    """AVG as exact-sum / count — deterministic for the same reason."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c) / F.count(c)


def flagship_revenue(tables: dict[str, DataFrame], top_n: int = 20) -> DataFrame:
    """Monthly revenue by region/nation: the 5-way join + agg + top-k.

    Join shape: big fact (lineitem) ⋈ mid (orders) shuffles on the order
    key; customer/nation/region are broadcast — at 100 TB only the
    lineitem⋈orders shuffle scales with data size, and AQE coalesces its
    partitions.
    """
    li, orders = tables["lineitem"], tables["orders"]
    cust, nation, region = tables["customer"], tables["nation"], tables["region"]

    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    agg = (
        joined.groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("anio"),
            F.month("o_orderdate").alias("mes"),
        )
        .agg(
            exact_sum(revenue("l_extendedprice", "l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    return agg.orderBy(
        F.col("revenue").desc(),
        F.col("region"),
        F.col("nation"),
        F.col("anio"),
        F.col("mes"),
    ).limit(top_n)


FLAGSHIP_REVENUE_SQL = f"""
SELECT r_name AS region,
       n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS anio,
       CAST(month(o_orderdate) AS INTEGER) AS mes,
       {EXACT_SUM_SQL.format(expr="l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*) AS n_lines,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, region, nation, anio, mes
LIMIT 20
"""


def pricing_summary(tables: dict[str, DataFrame]) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the canonical wide aggregation.

    Pure map-side-combinable aggregation over the biggest table — the
    shape that must stay in whole-stage codegen (no UDFs) to hold up at
    100 TB.
    """
    li = tables["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(revenue("l_extendedprice", "l_discount")).alias("sum_disc_price"),
            exact_sum(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax"))
            ).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag,
       l_linestatus,
       {EXACT_SUM_SQL.format(expr="l_quantity")} AS sum_qty,
       {EXACT_SUM_SQL.format(expr="l_extendedprice")} AS sum_base_price,
       {EXACT_SUM_SQL.format(expr="l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {EXACT_SUM_SQL.format(expr="l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {EXACT_SUM_SQL.format(expr="l_quantity")} / count(l_quantity) AS avg_qty,
       {EXACT_SUM_SQL.format(expr="l_extendedprice")} / count(l_extendedprice) AS avg_price,
       {EXACT_SUM_SQL.format(expr="l_discount")} / count(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_customers_per_region(tables: dict[str, DataFrame], k: int = 5) -> DataFrame:
    """Window top-k per group: rank customers by revenue within region."""
    from pyspark.sql import Window

    li, orders = tables["lineitem"], tables["orders"]
    cust, nation, region = tables["customer"], tables["nation"], tables["region"]
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("c_custkey").alias("custkey"))
        .agg(exact_sum(revenue("l_extendedprice", "l_discount")).alias("revenue"))
    )
    w = Window.partitionBy("region").orderBy(F.col("revenue").desc(), F.col("custkey"))
    return (
        per_cust.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("region", "custkey", "revenue", "rank")
        .orderBy("region", "rank")
    )


TOP_CUSTOMERS_SQL = f"""
WITH per_cust AS (
  SELECT r_name AS region,
         c_custkey AS custkey,
         {EXACT_SUM_SQL.format(expr="l_extendedprice * (1 - l_discount)")} AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
), ranked AS (
  SELECT region, custkey, revenue,
         CAST(row_number() OVER (PARTITION BY region ORDER BY revenue DESC, custkey) AS INTEGER) AS rank
  FROM per_cust
)
SELECT region, custkey, revenue, rank FROM ranked WHERE rank <= 5
ORDER BY region, rank
"""
