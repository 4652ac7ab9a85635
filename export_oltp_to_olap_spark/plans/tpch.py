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


# ---------------------------------------------------------------------------
# Round-7 widening: six more classics, again chosen for plan shapes the
# catalog does not exercise elsewhere.  Adaptations forced by the fixture
# schema (no l_commitdate / l_receiptdate / l_shipmode / p_container /
# c_phone) keep each query's RELATIONAL essence:
#
# * Q4  — EXISTS with a correlated comparison across both relations
#         ("late" := shipped > 60 days after order date stands in for
#         commit < receipt); compiles to a left-semi join whose
#         condition mixes an equality and an inequality.
# * Q7  — two copies of the SAME dimension (nation) joined under
#         different roles + a symmetric disjunction over the role pair
#         + year extraction.
# * Q12 — conditional two-way counts (urgent vs not) bucketed by a
#         derived CASE column (shipping-delay bands for shipmode).
# * Q14 — ratio of a conditionally-summed measure to its total in one
#         aggregate pass (CASE inside exact_sum).
# * Q19 — disjunction of conjunctive (brand, size-range, qty-range)
#         triples as the JOIN predicate: Catalyst must push the common
#         equality and keep the residual OR as a join filter.
# * Q22 — anti-join against orders gated by a scalar aggregate
#         subquery threshold (customers above the average balance who
#         never ordered).


def q4_order_priority(tables: dict[str, DataFrame]) -> DataFrame:
    """Orders in one quarter with at least one late lineitem, counted
    per priority — the EXISTS shape: a left-semi join whose condition
    correlates the two relations beyond the key equality
    (``l_shipdate > o_orderdate + 60 days``)."""
    o, li = tables["orders"], tables["lineitem"]
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-07-01"))
            & (F.col("o_orderdate") < F.lit("1997-10-01"))
        )
        .join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1997-07-01'
  AND o_orderdate < DATE '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""".strip()


Q7_NATIONS = ("NATION_1", "NATION_2")


def q7_volume_shipping(tables: dict[str, DataFrame]) -> DataFrame:
    """Revenue flowing between two nations by year — the same dimension
    (nation) joined twice under different roles (supplier's vs
    customer's), with the symmetric pair disjunction and a year
    extraction on the fact date."""
    s, li, o, c = (
        tables["supplier"],
        tables["lineitem"],
        tables["orders"],
        tables["customer"],
    )
    n1 = tables["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = tables["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    a, b = Q7_NATIONS
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(exact_sum(F.expr(REVENUE)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {EXACT_SUM_SQL.format(expr=REVENUE)} AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{Q7_NATIONS[0]}' AND n2.n_name = '{Q7_NATIONS[1]}')
    OR (n1.n_name = '{Q7_NATIONS[1]}' AND n2.n_name = '{Q7_NATIONS[0]}'))
  AND l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
""".strip()


def q12_shipping_delay_priority(tables: dict[str, DataFrame]) -> DataFrame:
    """Urgent-vs-other line counts per shipping-delay band — Q12's
    conditional two-way counting, bucketed by a derived CASE column
    (delay bands stand in for the missing ``l_shipmode``)."""
    o, li = tables["orders"], tables["lineitem"]
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(delay <= 30, "0-30")
        .when(delay <= 90, "31-90")
        .otherwise("90+")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy(band.alias("delay_band"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_band")
    )


Q12_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN '31-90'
            ELSE '90+' END AS delay_band,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1997-01-01'
  AND l_shipdate < DATE '1998-01-01'
GROUP BY 1
ORDER BY delay_band
""".strip()


def q14_promo_revenue(tables: dict[str, DataFrame]) -> DataFrame:
    """Share of one month's revenue from PROMO parts — a conditional
    sum and its total in ONE aggregate pass over the join, then the
    ratio (both sums exact-decimal, the percentage a deterministic
    double division of the two rounded sums)."""
    li, p = tables["lineitem"], tables["part"]
    promo = F.when(F.col("p_type") == "PROMO", F.expr(REVENUE)).otherwise(F.lit(0.0))
    agg = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .where(
            (F.col("l_shipdate") >= F.lit("1997-09-01"))
            & (F.col("l_shipdate") < F.lit("1997-10-01"))
        )
        .agg(
            exact_sum(promo).alias("promo_revenue"),
            exact_sum(F.expr(REVENUE)).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 4
        ).alias("promo_pct"),
    )


Q14_SQL = f"""
WITH sums AS (
  SELECT
    {EXACT_SUM_SQL.format(expr="CASE WHEN p_type = 'PROMO' THEN " + REVENUE + " ELSE 0.0 END")}
      AS promo_revenue,
    {EXACT_SUM_SQL.format(expr=REVENUE)} AS total_revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= DATE '1997-09-01'
    AND l_shipdate < DATE '1997-10-01'
)
SELECT promo_revenue, total_revenue,
       ROUND(100.0 * promo_revenue / total_revenue, 4) AS promo_pct
FROM sums
""".strip()


Q19_TRIPLES = (
    ("Brand#4", 1, 15, 1, 11),
    ("Brand#2", 10, 30, 10, 20),
    ("Brand#19", 20, 50, 20, 30),
)


def q19_discounted_revenue(tables: dict[str, DataFrame]) -> DataFrame:
    """Revenue matching ANY of three (brand, size-range, qty-range)
    conjunctions — the disjunctive-join-predicate shape: the key
    equality is pushed into the join, the OR-of-ANDs stays as the
    residual filter, and per-branch columns still prune/push to the
    scans."""
    li, p = tables["lineitem"], tables["part"]
    cond = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_TRIPLES:
        branch = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = branch if cond is None else (cond | branch)
    return (
        li.join(p, (F.col("l_partkey") == F.col("p_partkey")) & cond)
        .agg(
            exact_sum(F.expr(REVENUE)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_SQL = f"""
SELECT {EXACT_SUM_SQL.format(expr=REVENUE)} AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {sl} AND {sh} "
    f"AND l_quantity BETWEEN {ql} AND {qh})"
    for b, sl, sh, ql, qh in Q19_TRIPLES
)}
""".strip()


Q22_SEGMENTS = ("BUILDING", "MACHINERY", "HOUSEHOLD")


Q22_CUTOFF = "1999-01-01"


def q22_global_sales_opportunity(tables: dict[str, DataFrame]) -> DataFrame:
    """Well-funded customers gone DORMANT (no order since the cutoff),
    per segment — the anti-join gated by a scalar aggregate threshold
    (average positive balance over the segment population).  Every
    fixture customer has SOME order, so the dormancy cutoff supplies
    the selectivity the original's never-ordered gate has at TPC-H
    scale; the threshold is computed in the exact-decimal convention so
    the inequality cut is engine-identical."""
    c, o = tables["customer"], tables["orders"]
    seg = c.where(F.col("c_mktsegment").isin(*Q22_SEGMENTS))
    threshold = seg.where(F.col("c_acctbal") > 0).agg(
        F.round(
            F.avg(F.col("c_acctbal").cast("decimal(28,10)")), 4
        ).cast("double").alias("avg_bal")
    )
    recent = o.where(F.col("o_orderdate") >= F.lit(Q22_CUTOFF))
    return (
        seg.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            exact_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = f"""
SELECT c_mktsegment,
       count(*) AS n_custs,
       {EXACT_SUM_SQL.format(expr="c_acctbal")} AS total_acctbal
FROM customer
WHERE c_mktsegment IN {Q22_SEGMENTS!r}
  AND c_acctbal > (
    SELECT CAST(ROUND(AVG(CAST(c_acctbal AS DECIMAL(28,10))), 4) AS DOUBLE)
    FROM customer
    WHERE c_mktsegment IN {Q22_SEGMENTS!r} AND c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= DATE '{Q22_CUTOFF}'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""".strip()


# Second round-7 batch: four more shapes, chosen because each exercises
# an aggregation topology the catalog still lacked.
#
# * Q8  — market share: a conditional revenue ratio per year over a
#         seven-relation join (two nation roles + region gate).
# * Q13 — distribution of group sizes: LEFT join, per-customer count,
#         then a second aggregation OVER the counts (histogram of
#         cardinalities — the "group by the group size" topology).
# * Q15 — argmax via aggregate subquery: per-supplier revenue, keep the
#         suppliers equal to the global max (ties preserved).
# * Q17 — per-group aggregate threshold: lineitems below 20% of their
#         part's average quantity (the correlated-average shape).


Q8_NATION = "NATION_3"


def q8_market_share(tables: dict[str, DataFrame]) -> DataFrame:
    """Share of AMERICA's revenue supplied by one nation, per order
    year — the conditional-ratio-per-group topology over the full
    seven-relation star (customer chain fixes the market region, the
    supplier's nation is the CASE condition)."""
    c, o, li = tables["customer"], tables["orders"], tables["lineitem"]
    s, n, r = tables["supplier"], tables["nation"], tables["region"]
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    nation_rev = F.when(
        F.col("supp_nation") == Q8_NATION, F.expr(REVENUE)
    ).otherwise(F.lit(0.0))
    agg = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(r, F.col("cn_region") == F.col("r_regionkey"))
        .where(F.col("r_name") == "AMERICA")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            exact_sum(nation_rev).alias("nation_revenue"),
            exact_sum(F.expr(REVENUE)).alias("total_revenue"),
        )
    )
    return (
        agg.select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {EXACT_SUM_SQL.format(expr="CASE WHEN n2.n_name = '" + Q8_NATION + "' THEN " + REVENUE + " ELSE 0.0 END")}
           AS nation_revenue,
         {EXACT_SUM_SQL.format(expr=REVENUE)} AS total_revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
  GROUP BY year(o_orderdate)
)
SELECT o_year, nation_revenue, total_revenue,
       ROUND(nation_revenue / total_revenue, 6) AS mkt_share
FROM yearly
ORDER BY o_year
""".strip()


def q13_customer_distribution(tables: dict[str, DataFrame]) -> DataFrame:
    """How many customers placed exactly N orders (zero included) — the
    group-by-the-group-size topology: LEFT join so orderless customers
    count at 0, per-customer count, then a second aggregation over the
    counts."""
    c, o = tables["customer"], tables["orders"]
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""".strip()


def q15_top_supplier(tables: dict[str, DataFrame]) -> DataFrame:
    """Suppliers whose quarterly revenue equals the global maximum —
    argmax via an aggregate-of-aggregate scalar subquery, ties kept
    (exact decimal revenue, so the equality join is engine-safe)."""
    li, s = tables["lineitem"], tables["supplier"]
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(exact_sum(F.expr(REVENUE)).alias("total_rev"))
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, {EXACT_SUM_SQL.format(expr=REVENUE)} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
""".strip()


def q17_small_quantity_revenue(tables: dict[str, DataFrame]) -> DataFrame:
    """Average yearly revenue lost by not stocking small orders: line
    items under 20% of their part's average quantity — the correlated
    per-group-average threshold, decorrelated into an aggregate join
    (the threshold is decimal-exact so the cut is engine-identical)."""
    li, p = tables["lineitem"], tables["part"]
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(
            F.round(
                F.lit(0.2) * F.avg(F.col("l_quantity").cast("decimal(28,10)")), 4
            ).cast("double").alias("qty_threshold")
        )
    )
    return (
        li.join(p.where(F.col("p_brand") == "Brand#4"), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            exact_sum(F.col("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
            F.round(exact_sum(F.col("l_extendedprice")) / F.lit(7.0), 2).alias("avg_yearly"),
        )
    )


Q17_SQL = f"""
WITH thresholds AS (
  SELECT l_partkey AS t_partkey,
         CAST(ROUND(0.2 * AVG(CAST(l_quantity AS DECIMAL(28,10))), 4) AS DOUBLE)
           AS qty_threshold
  FROM lineitem
  GROUP BY l_partkey
)
SELECT {EXACT_SUM_SQL.format(expr="l_extendedprice")} AS total_price,
       count(*) AS n_lines,
       ROUND({EXACT_SUM_SQL.format(expr="l_extendedprice")} / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN thresholds ON l_partkey = t_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < qty_threshold
""".strip()


# ----------------------------------------------------------------------
# Round-7 completion batch: the six classics that need `partsupp` or the
# commit/receipt dates the fixture lacks, re-grounded on lineitem as the
# supply-relationship evidence (partsupp's role) and on
# ``l_shipdate - o_orderdate`` as the lateness signal (receipt/commit's
# role).  With these the catalog carries an adaptation of ALL 22 TPC-H
# queries.  Shapes added:
#
# * Q2  — correlated per-group MIN decorrelated into an equality join
#         back on the aggregate (min-cost supplier per part), gated by a
#         region dimension chain, wide top-k.
# * Q9  — five-relation profit rollup with an expression mixing fact
#         and dimension columns inside one exact-decimal SUM.
# * Q11 — HAVING against a scalar aggregate-of-aggregate threshold
#         (share-of-total cut over a grouped sum).
# * Q16 — DISTINCT pair derivation + NOT-IN anti-join + COUNT(DISTINCT)
#         per three-attribute group.
# * Q20 — two-level aggregate join (per-supplier share vs per-part
#         total) feeding a semi-join into the dimension chain.
# * Q21 — EXISTS + NOT EXISTS double correlation on the same relation
#         under different aliases (left-semi then left-anti with a
#         non-equality residual on the join key pair).


Q2_TYPE = "STANDARD"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20


def q2_min_cost_supplier(tables: dict[str, DataFrame]) -> DataFrame:
    """Cheapest EUROPE supplier per STANDARD mid-size part.

    Adaptation: the fixture has no ``partsupp``, so the supply
    relationship is the one lineitem witnesses: a (part, supplier)
    offer's cost is the MINIMUM discounted charge ever shipped.  MIN of
    doubles is engine-exact (it returns one of the inputs), so the
    decorrelated min-equality join needs no decimal scaffolding."""
    li, s, n, r, p = (
        tables["lineitem"],
        tables["supplier"],
        tables["nation"],
        tables["region"],
        tables["part"],
    )
    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.expr(REVENUE)).alias("supply_cost"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    best = offers.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("supply_cost").alias("best_cost")
    )
    wanted = p.where(
        (F.col("p_type") == Q2_TYPE)
        & F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("supply_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = f"""
WITH offers AS (
  SELECT l_partkey, l_suppkey, s_acctbal, s_name, n_name,
         MIN({REVENUE}) AS supply_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey, s_acctbal, s_name, n_name
),
best AS (
  SELECT l_partkey AS b_partkey, MIN(supply_cost) AS best_cost
  FROM offers GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM offers
JOIN best ON l_partkey = b_partkey AND supply_cost = best_cost
JOIN part ON l_partkey = p_partkey
WHERE p_type = '{Q2_TYPE}' AND p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""".strip()


Q9_PATTERN = "%widget%"
Q9_COST_RATE = 0.6
Q9_PROFIT = f"l_extendedprice * (1 - l_discount) - {Q9_COST_RATE} * p_retailprice * l_quantity"


def q9_product_type_profit(tables: dict[str, DataFrame]) -> DataFrame:
    """Profit on widget-named parts by supplier nation and order year.

    Adaptation: ``ps_supplycost`` does not exist; unit cost is modeled
    as a fixed fraction of ``p_retailprice`` (deterministic, column-
    derived), keeping Q9's defining shape — a profit expression mixing
    fact and dimension columns inside one decimal-exact SUM over a
    five-relation join."""
    li, p, s, n, o = (
        tables["lineitem"],
        tables["part"],
        tables["supplier"],
        tables["nation"],
        tables["orders"],
    )
    return (
        li.join(
            F.broadcast(p.where(F.col("p_name").like(Q9_PATTERN))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(exact_sum(F.expr(Q9_PROFIT)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {EXACT_SUM_SQL.format(expr=Q9_PROFIT)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '{Q9_PATTERN}'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
""".strip()


Q11_NATION = "NATION_7"
Q11_MULTIPLE = "3"


def q11_important_flow_value(tables: dict[str, DataFrame]) -> DataFrame:
    """Parts whose traded value through one nation's suppliers is well
    above the per-part average.

    Adaptation: stock value (``ps_supplycost * ps_availqty``) becomes
    the nation's observed discounted-charge flow per part.  The scalar
    threshold is an aggregate OF the grouped aggregate — Q11's defining
    shape — but cut as a MULTIPLE OF THE AVERAGE rather than the spec's
    fixed share-of-total: a fixed share divided by a growing part count
    selects nothing as data scales (the spec itself scales its fraction
    by 1/SF); the multiple-of-average form is scale-free, so the same
    constant works from the sf0.001 fixture to 100 TB.  The cut is
    evaluated as ``part_value * count > multiple * total`` — pure
    decimal multiplication, no division or decimal AVG (DuckDB's AVG
    over decimal degrades to DOUBLE), so the edge is bit-identical on
    both engines."""
    li, s, n = tables["lineitem"], tables["supplier"], tables["nation"]
    flow = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n.where(F.col("n_name") == Q11_NATION)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(exact_sum(F.expr(REVENUE)).alias("part_value"))
    )
    totals = flow.agg(
        F.sum(F.col("part_value").cast("decimal(28,10)")).alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        flow.join(
            F.broadcast(totals),
            F.col("part_value").cast("decimal(28,10)") * F.col("n_parts")
            > F.lit(Q11_MULTIPLE).cast("decimal(8,6)") * F.col("total_value"),
        )
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


Q11_SQL = f"""
WITH flow AS (
  SELECT l_partkey AS p_partkey,
         {EXACT_SUM_SQL.format(expr=REVENUE)} AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY l_partkey
)
SELECT p_partkey, part_value
FROM flow
WHERE CAST(part_value AS DECIMAL(28,10)) * (SELECT COUNT(*) FROM flow)
      > CAST({Q11_MULTIPLE} AS DECIMAL(8,6))
        * (SELECT SUM(CAST(part_value AS DECIMAL(28,10))) FROM flow)
ORDER BY part_value DESC, p_partkey
""".strip()


Q16_BRAND_NOT = "Brand#4"
Q16_TYPE_NOT = "PROMO"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def q16_supplier_relationship_count(tables: dict[str, DataFrame]) -> DataFrame:
    """Distinct suppliers observed shipping each (brand, type, size)
    group, excluding suppliers in arrears.

    Adaptation: the (part, supplier) relationships are the DISTINCT
    pairs lineitem witnesses (partsupp's content); the complaint-comment
    exclusion becomes ``s_acctbal < 0`` (the fixture has no comments).
    Shape kept: distinct-pair derivation, NOT-IN anti-join, then
    COUNT(DISTINCT) per three-attribute group."""
    li, p, s = tables["lineitem"], tables["part"], tables["supplier"]
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    wanted = p.where(
        (F.col("p_brand") != Q16_BRAND_NOT)
        & (F.col("p_type") != Q16_TYPE_NOT)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    return (
        pairs.join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_BRAND_NOT}'
  AND p_type <> '{Q16_TYPE_NOT}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""".strip()


Q20_PATTERN = "red%"
Q20_YEAR_LO, Q20_YEAR_HI = "1997-01-01", "1998-01-01"
Q20_SHARE = 0.25


def q20_dominant_share_suppliers(tables: dict[str, DataFrame]) -> DataFrame:
    """Suppliers who carried more than a quarter of any red part's 1997
    volume.

    Adaptation: ``ps_availqty > 0.5 * demand`` becomes "this supplier's
    shipped quantity exceeds ``Q20_SHARE`` of the part's total shipped
    quantity" — the same two-level aggregate comparison feeding a
    semi-join into the supplier/nation chain.  Quantities are
    integer-valued and the share is a power of two, so the double
    comparison is exact on both engines."""
    li, s, n, p = (
        tables["lineitem"],
        tables["supplier"],
        tables["nation"],
        tables["part"],
    )
    year = li.where(
        (F.col("l_shipdate") >= F.lit(Q20_YEAR_LO))
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_HI))
    )
    per_supp = year.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = per_supp.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        per_supp.join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .join(
            F.broadcast(p.where(F.col("p_name").like(Q20_PATTERN))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where(F.col("supp_qty") > F.lit(Q20_SHARE) * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH demand AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= DATE '{Q20_YEAR_LO}' AND l_shipdate < DATE '{Q20_YEAR_HI}'
  GROUP BY l_partkey, l_suppkey
),
total AS (
  SELECT l_partkey AS t_partkey, SUM(supp_qty) AS part_qty
  FROM demand GROUP BY l_partkey
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM demand
  JOIN total ON l_partkey = t_partkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{Q20_PATTERN}' AND supp_qty > {Q20_SHARE} * part_qty
)
ORDER BY s_name
""".strip()


Q21_LATE_DAYS = 45


def q21_sole_blame_suppliers(tables: dict[str, DataFrame]) -> DataFrame:
    """Suppliers solely to blame for late finalized orders: their line
    shipped late while every other supplier on the order shipped on
    time.

    Adaptation: the fixture carries no commit/receipt dates, so "late"
    is ``l_shipdate > o_orderdate + 45 days`` (the q4 convention).  The
    defining shape survives intact: EXISTS (another supplier on the
    order) as a left-semi join and NOT EXISTS (another LATE supplier on
    the order) as a left-anti join, both with the ``suppkey <>``
    residual beside the orderkey equality."""
    li, o, s = tables["lineitem"], tables["orders"], tables["supplier"]
    late = (
        li.join(
            o.where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    ).distinct()
    return (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = f"""
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND o3.o_orderstatus = 'F'
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""".strip()


def q9_profit_trend(tables: dict[str, DataFrame]) -> DataFrame:
    """Per-nation profit trend over the Q9 rollup: running cumulative
    profit and year-over-year growth — the aggregate→window-lag→ratio
    composite the plain TPC-H set lacks (every other window query in
    the catalog ranks or buckets; this one differences a TIME SERIES of
    aggregates).  The cumulative sum is decimal-exact (order-dependent
    double summation would drift between engines); the growth ratio
    divides two already-rounded 2-decimal doubles, the same engine-safe
    pattern as the fingerprint densities."""
    from pyspark.sql import Window

    profit = q9_product_type_profit(tables)
    w = Window.partitionBy("nation").orderBy("o_year")
    cum = Window.partitionBy("nation").orderBy("o_year").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        profit.withColumn(
            "cum_profit",
            F.round(
                F.sum(F.col("sum_profit").cast("decimal(28,10)")).over(cum), 2
            ).cast("double"),
        )
        .withColumn("prev_profit", F.lag("sum_profit").over(w))
        # nullif pins the zero-denominator case to NULL on BOTH engines:
        # profit can be negative, so a nation-year summing to exactly 0
        # is possible — Spark (non-ANSI) would return NULL for x/0 while
        # DuckDB's IEEE doubles return ±inf/NaN (ADVICE r7).
        .withColumn(
            "yoy_growth",
            F.round(
                (F.col("sum_profit") - F.col("prev_profit"))
                / F.nullif(F.col("prev_profit"), F.lit(0.0)),
                6,
            ),
        )
        .orderBy("nation", "o_year")
    )


Q9_TREND_SQL = f"""
WITH profit AS (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {EXACT_SUM_SQL.format(expr=Q9_PROFIT)} AS sum_profit
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '{Q9_PATTERN}'
  GROUP BY n_name, year(o_orderdate)
)
SELECT nation, o_year, sum_profit,
       CAST(ROUND(SUM(CAST(sum_profit AS DECIMAL(28,10)))
                    OVER (PARTITION BY nation ORDER BY o_year), 2) AS DOUBLE)
         AS cum_profit,
       lag(sum_profit) OVER (PARTITION BY nation ORDER BY o_year) AS prev_profit,
       -- nullif: a zero prev_profit must yield NULL on both engines
       -- (DuckDB IEEE doubles would give inf/NaN, Spark gives NULL)
       round((sum_profit - lag(sum_profit) OVER (PARTITION BY nation ORDER BY o_year))
             / nullif(lag(sum_profit) OVER (PARTITION BY nation ORDER BY o_year), 0), 6)
         AS yoy_growth
FROM profit
ORDER BY nation, o_year
""".strip()
