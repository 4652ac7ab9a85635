"""TPC-H-adapted analytic suite — the standard warehouse workload.

Five classics adapted to the fixture subset of the TPC-H schema (no
partsupp, no ship/commit/receipt beyond ``l_shipdate``), chosen for
composite plan shapes the rest of the catalog does not exercise
verbatim:

* Q3  — selective date predicates on BOTH join sides + group + top-k
* Q5  — six-way join with the cross-dimension equality
        ``c_nationkey = s_nationkey`` (customer and supplier must share
        a nation; two independent dimension chains meet in the fact)
* Q6  — pure selective-scan aggregate (predicate pushdown showcase)
* Q10 — returned-items revenue: fact-filtered join back to customer
        with a wide projection + top-k
* Q18 — large-volume orders: HAVING-style aggregate subquery feeding
        a semi-join, then re-aggregation

All money math uses the `exact_sum` decimal convention so the DuckDB
oracles hash-match.  Scale notes: every dimension side broadcasts (AQE
re-checks at runtime); lineitem scans carry `PushedFilters` for the
date/flag predicates; top-k compiles to TakeOrderedAndProject — the
same verified shapes as the flagship (SCALE.md).

Reference parity: none needed — the reference has no analytic surface;
this is the engine's warehouse-workload breadth next to the star ETL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.plans.flagship import EXACT_SUM_SQL, exact_sum

REVENUE = "l_extendedprice * (1 - l_discount)"


def q3_shipping_priority(tables: dict[str, DataFrame]) -> DataFrame:
    """Unshipped high-value orders for one segment: revenue of orders
    placed before a date with lineitems shipped after it."""
    c, o, li = tables["customer"], tables["orders"], tables["lineitem"]
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1997-03-15"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.lit("1997-03-15"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.expr(REVENUE)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {EXACT_SUM_SQL.format(expr=REVENUE)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1997-03-15'
  AND l_shipdate > DATE '1997-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""".strip()


def q5_local_supplier_volume(tables: dict[str, DataFrame]) -> DataFrame:
    """Revenue by nation where the supplier and the customer share the
    nation — two dimension chains meeting in the fact row."""
    c, o, li = tables["customer"], tables["orders"], tables["lineitem"]
    s, n, r = tables["supplier"], tables["nation"], tables["region"]
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(exact_sum(F.expr(REVENUE)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


Q5_SQL = f"""
SELECT n_name AS nation,
       {EXACT_SUM_SQL.format(expr=REVENUE)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1997-01-01'
  AND o_orderdate < DATE '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation
""".strip()


def q6_forecast_revenue(tables: dict[str, DataFrame]) -> DataFrame:
    """Pure selective scan: one year, a discount band, small quantities
    — the pushdown/pruning showcase (no join at all)."""
    li = tables["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(F.expr("l_extendedprice * l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q6_SQL = f"""
SELECT {EXACT_SUM_SQL.format(expr="l_extendedprice * l_discount")} AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01'
  AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""".strip()


def q10_returned_items(tables: dict[str, DataFrame]) -> DataFrame:
    """Customers who returned the most revenue in one quarter."""
    c, o, li, n = (
        tables["customer"],
        tables["orders"],
        tables["lineitem"],
        tables["nation"],
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1997-10-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_returnflag") == "R")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(exact_sum(F.expr(REVENUE)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
       {EXACT_SUM_SQL.format(expr=REVENUE)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1997-10-01'
  AND o_orderdate < DATE '1998-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".strip()


Q18_QTY = 250


def q18_large_volume_orders(tables: dict[str, DataFrame]) -> DataFrame:
    """Orders whose total quantity exceeds a threshold (aggregate
    subquery → semi-join → re-aggregation with the customer row)."""
    c, o, li = tables["customer"], tables["orders"], tables["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > Q18_QTY)
        .select("l_orderkey")
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(tables["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {Q18_QTY}
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""".strip()
