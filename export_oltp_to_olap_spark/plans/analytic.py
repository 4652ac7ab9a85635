"""Breadth of the analytic surface: grouping sets, set ops, semi/anti
joins, pivot, point/range filters, top-k, scalar-function suite.

Thin demonstrations over the fixture tables — each is an operator family
from SURVEY.md §2 (B3/B4, G, H, plus the free Spark analytics the star
exists for), registered with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.plans.flagship import EXACT_SUM_SQL, exact_sum


def rollup_revenue(tables: dict[str, DataFrame]) -> DataFrame:
    """ROLLUP over region→nation with exact revenue sums (D: grouping sets)."""
    li, orders = tables["lineitem"], tables["orders"]
    cust, nation, region = tables["customer"], tables["nation"], tables["region"]
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            exact_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(
            F.col("region").asc_nulls_first(), F.col("nation").asc_nulls_first()
        )
    )


ROLLUP_REVENUE_SQL = f"""
SELECT r_name AS region, n_name AS nation,
       {EXACT_SUM_SQL.format(expr="l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST
"""


def cube_order_stats(tables: dict[str, DataFrame]) -> DataFrame:
    """CUBE over (status, priority) with counts and exact totals."""
    orders = tables["orders"]
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_ORDER_STATS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {EXACT_SUM_SQL.format(expr="o_totalprice")} AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def setops_customers(tables: dict[str, DataFrame]) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct semantics) over customer key
    sets, tagged so one result covers all three (H)."""
    cust = tables["customer"]
    rich = cust.where(F.col("c_acctbal") > 6000).select("c_custkey")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    union = rich.union(building).distinct().withColumn("op", F.lit("union"))
    intersect = rich.intersect(building).withColumn("op", F.lit("intersect"))
    except_ = rich.subtract(building).withColumn("op", F.lit("except"))
    return union.unionByName(intersect).unionByName(except_).select("op", "c_custkey")


SETOPS_CUSTOMERS_SQL = """
WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 6000),
building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM rich UNION SELECT c_custkey FROM building)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM building)
UNION ALL
SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM building)
"""


def semi_anti_customers(tables: dict[str, DataFrame]) -> DataFrame:
    """LEFT SEMI (has orders) / LEFT ANTI (no orders) — J4's primitive."""
    cust, orders = tables["customer"], tables["orders"]
    keys = orders.select(F.col("o_custkey").alias("c_custkey"))
    with_orders = cust.join(keys, "c_custkey", "left_semi").select(
        F.lit("has_orders").alias("op"), "c_custkey"
    )
    without = cust.join(keys, "c_custkey", "left_anti").select(
        F.lit("no_orders").alias("op"), "c_custkey"
    )
    return with_orders.unionByName(without)


SEMI_ANTI_SQL = """
SELECT 'has_orders' AS op, c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT 'no_orders' AS op, c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


PIVOT_STATUSES = ("F", "O", "P")


def pivot_priority_status(tables: dict[str, DataFrame]) -> DataFrame:
    """Pivot order counts: rows = priority, columns = status (fixed set)."""
    orders = tables["orders"]
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(PIVOT_STATUSES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(PIVOT_STATUSES))
        .orderBy("o_orderpriority")
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS "F",
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS "O",
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def point_filter_customer(tables: dict[str, DataFrame], key: int = 42) -> DataFrame:
    """B3: parameterized point filter — pushed to the scan (the
    incremental-sync predicate, ref :207)."""
    return tables["customer"].where(F.col("c_custkey") == key)


POINT_FILTER_SQL = "SELECT * FROM customer WHERE c_custkey = 42"


def date_range_orders(tables: dict[str, DataFrame]) -> DataFrame:
    """B4: date-range predicate + per-status counts."""
    orders = tables["orders"]
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-01-01"))
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("o_totalprice").alias("total"))
        .orderBy("o_orderstatus")
    )


DATE_RANGE_SQL = f"""
SELECT o_orderstatus, count(*) AS n,
       {EXACT_SUM_SQL.format(expr="o_totalprice")} AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def correlated_lookup(tables: dict[str, DataFrame], order_key: int = 7) -> DataFrame:
    """A7: the reference's correlated point lookup (orden → id_cliente,
    ref :383-386) on fixture shapes: orderkey → custkey."""
    return tables["orders"].where(F.col("o_orderkey") == order_key).select("o_custkey")


CORRELATED_LOOKUP_SQL = "SELECT o_custkey FROM orders WHERE o_orderkey = 7"


def topk_orders(tables: dict[str, DataFrame], k: int = 10) -> DataFrame:
    """G: global ORDER BY + LIMIT with total tiebreak (TakeOrderedAndProject
    in the physical plan — no global sort materialization)."""
    return (
        tables["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def scalar_function_suite(tables: dict[str, DataFrame]) -> DataFrame:
    """F-family breadth: string/math/conditional scalar functions in one
    projection (each maps to the same ANSI function in DuckDB)."""
    cust = tables["customer"]
    return cust.select(
        "c_custkey",
        F.lower("c_name").alias("lower_name"),
        F.upper("c_mktsegment").alias("upper_seg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias("tag"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("masked_name"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("(b)")).alias(
            "seg_or_b"
        ),
        F.abs(F.col("c_acctbal")).alias("abs_bal"),
        F.round(F.col("c_acctbal"), 1).alias("bal_r1"),
        F.floor(F.col("c_acctbal")).cast("double").alias("bal_floor"),
        F.ceil(F.col("c_acctbal")).cast("double").alias("bal_ceil"),
        F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise(F.lit("pos")).alias("sign"),
    )


SCALAR_SUITE_SQL = """
SELECT c_custkey,
       lower(c_name) AS lower_name,
       upper(c_mktsegment) AS upper_seg,
       CAST(length(c_name) AS BIGINT) AS name_len,
       substring(c_name, 1, 8) AS name_prefix,
       concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tag,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked_name,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '(b)') AS seg_or_b,
       abs(c_acctbal) AS abs_bal,
       round(c_acctbal, 1) AS bal_r1,
       CAST(floor(c_acctbal) AS DOUBLE) AS bal_floor,
       CAST(ceil(c_acctbal) AS DOUBLE) AS bal_ceil,
       CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sign
FROM customer
"""


def distinct_agg_orders(tables: dict[str, DataFrame]) -> DataFrame:
    """Distinct aggregation: exact countDistinct per group (D)."""
    orders = tables["orders"]
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


DISTINCT_AGG_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def approx_distinct_parts(tables: dict[str, DataFrame]) -> DataFrame:
    """approx_count_distinct (HLL++) — no oracle (DuckDB's approx sketch
    differs); driver records the weaker rows-only check, and tests bound
    the relative error against the exact count."""
    li = tables["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


def orders_price_percentiles(tables: dict[str, DataFrame]) -> DataFrame:
    """EXACT continuous percentiles of order value per priority.

    Spark's ``percentile`` (exact, sort-based — not percentile_approx)
    and DuckDB's ``quantile_cont`` share the (n-1)·p linear-interpolation
    definition, so the oracle matches to double precision; outputs round
    to 4 decimals to absorb last-ulp interpolation noise.  At scale the
    exact percentile sorts each group once; swap to percentile_approx
    when an error bound is acceptable and the cardinality is huge.
    """
    orders = tables["orders"]
    pct = lambda p: F.round(F.expr(f"percentile(o_totalprice, {p})"), 4)  # noqa: E731
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            pct(0.5).alias("p50"),
            pct(0.9).alias("p90"),
            pct(0.99).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


ORDERS_PRICE_PERCENTILES_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def approx_percentiles_orders(tables: dict[str, DataFrame]) -> DataFrame:
    """Sketch percentiles (``percentile_approx``, Greenwald-Khanna with
    accuracy 10 000 ⇒ rank error ≤ 1/10 000) alongside the exact values.

    The mergeable-sketch path for huge/streaming cardinalities: each
    partition builds a bounded GK summary, partial merge map-side, one
    small row per group crosses the shuffle — an exact percentile
    instead sorts the whole group.  No oracle (DuckDB's approx_quantile
    is a different sketch); the driver records rows-only and the test
    bounds the sketch-vs-exact rank error.
    """
    orders = tables["orders"]
    apx = lambda p: F.round(  # noqa: E731
        F.expr(f"percentile_approx(o_totalprice, {p}, 10000)"), 4
    )
    ext = lambda p: F.round(F.expr(f"percentile(o_totalprice, {p})"), 4)  # noqa: E731
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            apx(0.5).alias("approx_p50"),
            ext(0.5).alias("exact_p50"),
            apx(0.99).alias("approx_p99"),
            ext(0.99).alias("exact_p99"),
        )
        .orderBy("o_orderpriority")
    )


def grouping_sets_orders(tables: dict[str, DataFrame]) -> DataFrame:
    """Explicit GROUPING SETS — the general form of cube/rollup: exactly
    the requested aggregation levels ((status), (priority), ()), computed
    in ONE pass with partial aggregation shared across sets (Expand +
    hash-agg), instead of three scans unioned.
    """
    orders = tables["orders"]
    orders.createOrReplaceTempView("__orders_gs")
    return tables["orders"].sparkSession.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               {EXACT_SUM_SQL.format(expr="o_totalprice")} AS total
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {EXACT_SUM_SQL.format(expr="o_totalprice")} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def orders_rolling_7d_revenue(tables: dict[str, DataFrame]) -> DataFrame:
    """Per-customer rolling 7-day order revenue — a RANGE frame over
    event time (``RANGE BETWEEN 6 days PRECEDING AND CURRENT ROW`` on the
    epoch-day ordering), the time-window complement of the ROWS frame in
    ``events_user_moving_value``.

    RANGE frames group peers by ORDER-BY VALUE, so same-day orders all
    see the same window total regardless of intra-day order — exactly the
    semantics a rolling-revenue feature needs.  DECIMAL accumulation
    keeps the double engine-exact; one shuffle on the partition key.
    """
    from pyspark.sql import Window

    orders = tables["orders"]
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, 0)
    )
    rolling = F.round(
        F.sum(F.col("o_totalprice").cast("decimal(28,10)")).over(w), 2
    ).cast("double")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        rolling.alias("revenue_7d"),
    )


ROLLING_7D_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
           PARTITION BY o_custkey
           ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS revenue_7d
FROM orders
"""


def orders_rank_suite(tables: dict[str, DataFrame]) -> DataFrame:
    """The ranking-function family in one query: rank, dense_rank,
    percent_rank, cume_dist, ntile(4), first/last value — per order
    priority, ordered by (price, key) so every rank is deterministic.

    All outputs are integers or exact small-integer ratios, hence
    engine-identical; one shuffle on the partition key shared by every
    window function (single window spec).
    """
    from pyspark.sql import Window

    orders = tables["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first("o_orderkey").over(w_full).cast("long").alias("cheapest_key"),
        F.last("o_orderkey").over(w_full).cast("long").alias("dearest_key"),
    )


RANK_SUITE_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(rank() OVER w AS INTEGER) AS rnk,
       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       CAST(first_value(o_orderkey) OVER wf AS BIGINT) AS cheapest_key,
       CAST(last_value(o_orderkey) OVER wf AS BIGINT) AS dearest_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
       wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def dq_oltp_checks(tables: dict[str, DataFrame]) -> DataFrame:
    """Data-quality validation suite over the OLTP inputs — the check
    battery an ETL runs before trusting a batch: PK uniqueness, FK
    orphan counts, domain violations, null rates.  One row per check,
    ``(check, violations)``; a healthy batch is all zeros (which the
    oracle proves, making regressions loud).

    Every check is a count aggregate or anti-join count — partial-agg /
    broadcast-anti shapes that scale linearly; the union of scalar
    results is negligible.
    """
    orders, customer, lineitem, part = (
        tables["orders"], tables["customer"], tables["lineitem"], tables["part"],
    )

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("check"), F.col("violations").cast("long").alias("violations")
        )

    pk_dup_orders = orders.groupBy("o_orderkey").count().where(F.col("count") > 1)
    checks = [
        one("orders_pk_duplicates",
            pk_dup_orders.agg(F.count(F.lit(1)).alias("violations"))),
        one("orders_orphan_customer",
            orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
                  .agg(F.count(F.lit(1)).alias("violations"))),
        one("lineitem_orphan_order",
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti")
                    .agg(F.count(F.lit(1)).alias("violations"))),
        one("lineitem_orphan_part",
            lineitem.join(part, lineitem.l_partkey == part.p_partkey, "left_anti")
                    .agg(F.count(F.lit(1)).alias("violations"))),
        one("orders_negative_total",
            orders.where(F.col("o_totalprice") < 0).agg(F.count(F.lit(1)).alias("violations"))),
        one("lineitem_bad_discount",
            lineitem.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
                    .agg(F.count(F.lit(1)).alias("violations"))),
        one("orders_null_date",
            orders.where(F.col("o_orderdate").isNull()).agg(F.count(F.lit(1)).alias("violations"))),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


DQ_OLTP_SQL = """
SELECT 'orders_pk_duplicates' AS check,
       CAST((SELECT count(*) FROM (
         SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
       )) AS BIGINT) AS violations
UNION ALL
SELECT 'orders_orphan_customer',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 'lineitem_orphan_order',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT)
UNION ALL
SELECT 'lineitem_orphan_part',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
            AS BIGINT)
UNION ALL
SELECT 'orders_negative_total',
       CAST((SELECT count(*) FROM orders WHERE o_totalprice < 0) AS BIGINT)
UNION ALL
SELECT 'lineitem_bad_discount',
       CAST((SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
UNION ALL
SELECT 'orders_null_date',
       CAST((SELECT count(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT)
"""


_PROFILE_COLS = (
    # (column, stringify-for-minmax) — doubles go through DECIMAL(18,2) so
    # both engines render the same text; everything else casts directly.
    ("o_orderkey", "raw"),
    ("o_custkey", "raw"),
    ("o_orderstatus", "raw"),
    ("o_totalprice", "decimal"),
    ("o_orderdate", "raw"),
    ("o_orderpriority", "raw"),
)


def profile_orders(tables: dict[str, DataFrame]) -> DataFrame:
    """Column-profiling report over ``orders`` — one row per column:
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``.

    The dataset-profiler every ingest pipeline runs before training on a
    new source: null rates expose broken extracts, distinct counts expose
    key/enum drift, min/max expose range regressions.

    Plan shape: ONE pass — a single aggregate computes every column's
    exact metrics (Catalyst plans the multi-distinct via one Expand =
    one shuffle of width × rows), then the wide row unpivots via
    ``stack`` into the per-column report.  No per-column rescans: at
    100 TB the table is read once.  Min/max stringify through stable
    renderings (doubles via DECIMAL(18,2)) so the report is
    engine-portable.
    """
    orders = tables["orders"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, mode in _PROFILE_COLS:
        aggs.append(F.sum(F.col(col).isNull().cast("long")).alias(f"nn_{col}"))
        aggs.append(F.count_distinct(F.col(col)).alias(f"nd_{col}"))
        source = (
            F.col(col).cast("decimal(18,2)") if mode == "decimal" else F.col(col)
        )
        aggs.append(F.min(source).cast("string").alias(f"mn_{col}"))
        aggs.append(F.max(source).cast("string").alias(f"mx_{col}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', nn_{col}, nd_{col}, mn_{col}, mx_{col}" for col, _ in _PROFILE_COLS
    )
    return (
        wide.select(
            F.col("n_rows"),
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
                "(column, n_nulls, n_distinct, min_value, max_value)"
            ),
        )
        .select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
        .orderBy("column")
    )


def _profile_orders_sql() -> str:
    parts = []
    for col, mode in _PROFILE_COLS:
        src = f"CAST({col} AS DECIMAL(18,2))" if mode == "decimal" else col
        parts.append(
            f"""
  SELECT '{col}' AS "column",
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
         CAST(min({src}) AS VARCHAR) AS min_value,
         CAST(max({src}) AS VARCHAR) AS max_value
  FROM orders"""
        )
    return "\nUNION ALL\n".join(parts) + '\nORDER BY "column"'


PROFILE_ORDERS_SQL = _profile_orders_sql()


def setops_all_orders(tables: dict[str, DataFrame]) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the MULTISET set operations (H).

    ``setops_customers`` covers the distinct forms; these preserve
    duplicate multiplicity (a customer with 3 qualifying orders on both
    sides intersects 3 times), which Spark plans as an aggregate-count +
    generate pass rather than the distinct forms' hash semi/anti join.
    Sources are order→customer multisets, so multiplicities are real.
    """
    orders = tables["orders"]
    big = orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    inter = big.intersectAll(urgent).withColumn("op", F.lit("intersect_all"))
    exc = big.exceptAll(urgent).withColumn("op", F.lit("except_all"))
    return (
        inter.unionByName(exc)
        .groupBy("op", "o_custkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .orderBy("op", "o_custkey")
    )


SETOPS_ALL_SQL = """
WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
tagged AS (
  SELECT 'intersect_all' AS op, o_custkey
  FROM (SELECT o_custkey FROM big INTERSECT ALL SELECT o_custkey FROM urgent)
  UNION ALL
  SELECT 'except_all' AS op, o_custkey
  FROM (SELECT o_custkey FROM big EXCEPT ALL SELECT o_custkey FROM urgent)
)
SELECT op, o_custkey, CAST(count(*) AS BIGINT) AS multiplicity
FROM tagged GROUP BY op, o_custkey
ORDER BY op, o_custkey
""".strip()


def reconcile_customers_full_outer(tables: dict[str, DataFrame]) -> DataFrame:
    """FULL OUTER join (C): reconcile two partial customer views — big
    spenders (aggregated from orders) vs high-balance accounts — keeping
    rows that exist on either side only.  The reconciliation/diff shape:
    ``side`` tags whether a key matched, was order-only, or account-only.
    Shuffle join on the key; neither side is guaranteed small, which is
    exactly when FULL OUTER can't be broadcast and the engine must plan
    a sort-merge."""
    orders, cust = tables["orders"], tables["customer"]
    spenders = (
        orders.where(F.col("o_totalprice") > 250000)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_big_orders"),
            exact_sum("o_totalprice").alias("big_spend"),
        )
    )
    rich = cust.where(F.col("c_acctbal") > 7000).select(
        F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal")
    )
    joined = spenders.join(rich, on="custkey", how="full_outer")
    return joined.select(
        "custkey",
        "n_big_orders",
        "big_spend",
        "acctbal",
        F.when(F.col("n_big_orders").isNull(), F.lit("account_only"))
        .when(F.col("acctbal").isNull(), F.lit("orders_only"))
        .otherwise(F.lit("both"))
        .alias("side"),
    ).orderBy("custkey")


RECONCILE_FULL_OUTER_SQL = f"""
WITH spenders AS (
  SELECT o_custkey AS custkey,
         count(*) AS n_big_orders,
         {EXACT_SUM_SQL.format(expr="o_totalprice")} AS big_spend
  FROM orders WHERE o_totalprice > 250000
  GROUP BY o_custkey
),
rich AS (
  SELECT c_custkey AS custkey, c_acctbal AS acctbal
  FROM customer WHERE c_acctbal > 7000
)
SELECT COALESCE(s.custkey, r.custkey) AS custkey,
       s.n_big_orders, s.big_spend, r.acctbal,
       CASE WHEN s.custkey IS NULL THEN 'account_only'
            WHEN r.custkey IS NULL THEN 'orders_only'
            ELSE 'both' END AS side
FROM spenders s FULL OUTER JOIN rich r ON s.custkey = r.custkey
ORDER BY custkey
""".strip()


# ---------------------------------------------------------------------------
# Subquery suite: correlated EXISTS / NOT EXISTS / IN / scalar subqueries
# ---------------------------------------------------------------------------

# One statement exercising every subquery family the DataFrame surface
# doesn't spell directly — Catalyst decorrelates the EXISTS pair into
# semi/anti joins, the correlated scalar count into an aggregated left
# join, and the IN into a semi join; DuckDB runs the IDENTICAL text, so
# the oracle also proves the two engines' decorrelation agrees.  The
# uncorrelated scalar average uses the exact-decimal sum convention
# (identical text both sides) to stay order-independent.
_SUBQUERY_SUITE_BODY = """
SELECT c.c_custkey,
       c.c_name,
       (SELECT count(*) FROM {orders} o3
         WHERE o3.o_custkey = c.c_custkey) AS n_orders,
       (SELECT count(*) FROM {orders} o4
         WHERE o4.o_custkey = c.c_custkey
           AND o4.o_totalprice >
               (SELECT CAST(ROUND(SUM(CAST(o5.o_totalprice AS DECIMAL(28,10))), 2)
                            AS DOUBLE) / count(*)
                  FROM {orders} o5)) AS n_above_avg
FROM {customer} c
WHERE EXISTS (SELECT 1 FROM {orders} o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM {orders} o2
                   WHERE o2.o_custkey = c.c_custkey
                     AND o2.o_orderstatus = 'P')
  AND c.c_nationkey IN (SELECT n.n_nationkey FROM {nation} n
                         WHERE n.n_regionkey <= 2)
ORDER BY c.c_custkey
"""


def subquery_suite(tables: dict[str, DataFrame]) -> DataFrame:
    tables["customer"].createOrReplaceTempView("__sub_customer")
    tables["orders"].createOrReplaceTempView("__sub_orders")
    tables["nation"].createOrReplaceTempView("__sub_nation")
    return tables["customer"].sparkSession.sql(
        _SUBQUERY_SUITE_BODY.format(
            customer="__sub_customer", orders="__sub_orders", nation="__sub_nation"
        )
    )


SUBQUERY_SUITE_SQL = _SUBQUERY_SUITE_BODY.format(
    customer="customer", orders="orders", nation="nation"
)


# ---------------------------------------------------------------------------
# Exact-decimal statistical moments: stddev / covariance / correlation
# ---------------------------------------------------------------------------


def stats_moments_lineitem(tables: dict[str, DataFrame]) -> DataFrame:
    """Per-returnflag second-moment statistics — stddev_pop, covar_pop,
    corr — computed ENGINE-EXACTLY.

    Spark's stddev/corr aggregates and DuckDB's use different update
    formulas and partition orders, so their float outputs differ in the
    last ulps and cannot survive a value-hash.  The fix is algebraic:
    aggregate the five power sums Σx, Σy, Σx², Σy², Σxy as EXACT
    decimals (map-side-combinable, one shuffle), cast the finished sums
    to double, and derive the moments with the same closed-form
    expression in both engines — identical inputs, identical IEEE
    arithmetic, bit-identical results.  The decimal sums are the same
    `exact_sum` discipline every money aggregate in this engine uses.
    """
    li = tables["lineitem"]
    x = F.col("l_quantity").cast("decimal(28,10)")
    y = F.col("l_extendedprice").cast("decimal(28,10)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / n
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / n
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / n
    return sums.select(
        "l_returnflag",
        "n",
        F.round(F.col("sx") / n, 6).alias("mean_qty"),
        F.round(F.sqrt(var_x), 6).alias("stddev_qty"),
        F.round(cov, 6).alias("covar_qty_price"),
        F.round(cov / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


STATS_MOMENTS_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,10)) * CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10)) * CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,10)) * CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       ROUND(sx / CAST(n AS DOUBLE), 6) AS mean_qty,
       ROUND(sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6) AS stddev_qty,
       ROUND((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS covar_qty_price,
       ROUND(((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
             / sqrt(((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                    * ((syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))), 6)
         AS corr_qty_price
FROM sums
ORDER BY l_returnflag
""".strip()
