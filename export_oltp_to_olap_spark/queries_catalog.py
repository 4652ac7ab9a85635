"""All registered (query, oracle) pairs — the SURVEY.md §2 coverage map.

Sections mirror the survey's operator inventory; each registration names
the operator(s) it demonstrates.  Implementations live in the package
modules; this catalog only wires them to fixture tables.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from export_oltp_to_olap_spark.plans import flagship, star_oracle
from export_oltp_to_olap_spark.plans.fact import fact_source
from export_oltp_to_olap_spark.plans.fixtures_adapter import oltp_tables_from_fixtures
from export_oltp_to_olap_spark.plans.star import build_star
from export_oltp_to_olap_spark.registry import register
from export_oltp_to_olap_spark.sources.parquet import load_tables

# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

_ANALYTIC_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _tables(spark: SparkSession, sf_dir: str, names=_ANALYTIC_TABLES):
    return load_tables(spark, sf_dir, names)


def _oltp(spark: SparkSession, sf_dir: str):
    return oltp_tables_from_fixtures(_tables(spark, sf_dir))


def _star(spark: SparkSession, sf_dir: str):
    return build_star(_oltp(spark, sf_dir))


# ---------------------------------------------------------------------------
# Flagship analytics (§2.D/E/G: scan→join→agg→window→sort→limit)
# ---------------------------------------------------------------------------


@register("flagship_revenue", flagship.FLAGSHIP_REVENUE_SQL)
def q_flagship(spark: SparkSession, sf_dir: str):
    """5-way join + groupBy + exact-sum + top-k (SURVEY §7.2 step 2)."""
    return flagship.flagship_revenue(_tables(spark, sf_dir))


@register("pricing_summary", flagship.PRICING_SUMMARY_SQL)
def q_pricing(spark: SparkSession, sf_dir: str):
    """TPC-H-Q1-shaped wide aggregation (D: hash-agg with partial agg)."""
    return flagship.pricing_summary(_tables(spark, sf_dir))


@register("top_customers_per_region", flagship.TOP_CUSTOMERS_SQL)
def q_top_customers(spark: SparkSession, sf_dir: str):
    """Window top-k per group (E: row_number over partitioned window)."""
    return flagship.top_customers_per_region(_tables(spark, sf_dir))


# ---------------------------------------------------------------------------
# Star ETL (§2.A/B/C/D: the reference's whole transform surface)
# ---------------------------------------------------------------------------


@register("star_dim_cliente", star_oracle.DIM_CLIENTE_SQL)
def q_dim_cliente(spark: SparkSession, sf_dir: str):
    """J2 left-enrich + J1 LWW dedup + J4 RI placeholders (ref :194-212)."""
    return _star(spark, sf_dir).dim_cliente


@register("star_dim_categoria", star_oracle.DIM_CATEGORIA_SQL)
def q_dim_categoria(spark: SparkSession, sf_dir: str):
    """A2 scan + J1 upsert dedup + J4 placeholders (ref :215-224)."""
    return _star(spark, sf_dir).dim_categoria


@register("star_dim_producto", star_oracle.DIM_PRODUCTO_SQL)
def q_dim_producto(spark: SparkSession, sf_dir: str):
    """A3 scan + J1 + J4 (ref :227-236)."""
    return _star(spark, sf_dir).dim_producto


@register("star_dim_tiempo", star_oracle.DIM_TIEMPO_SQL)
def q_dim_tiempo(spark: SparkSession, sf_dir: str):
    """D2 distinct dates + F1-F6 date parts + dense_rank SK (ref :95-145)."""
    return _star(spark, sf_dir).dim_tiempo


@register("star_dim_metodo_pago", star_oracle.DIM_METODO_PAGO_SQL)
def q_dim_metodo_pago(spark: SparkSession, sf_dir: str):
    """D1 distinct-value dim + SK (ref :147-158)."""
    return _star(spark, sf_dir).dim_metodo_pago


@register("star_dim_envio", star_oracle.DIM_ENVIO_SQL)
def q_dim_envio(spark: SparkSession, sf_dir: str):
    """D1 distinct-pair dim + SK (ref :160-172)."""
    return _star(spark, sf_dir).dim_envio


@register("star_hecho_ventas", star_oracle.HECHO_VENTAS_SQL)
def q_hecho_ventas(spark: SparkSession, sf_dir: str):
    """J3 4-way join + J5 SK resolution + B5 guard + F8/F9 measures +
    J1/D3 grain dedup (ref :239-334)."""
    return _star(spark, sf_dir).hecho_ventas


@register("star_fact_source", star_oracle.FACT_SOURCE_SQL)
def q_fact_source(spark: SparkSession, sf_dir: str):
    """J3/B2: the raw 4-way fact-source join, 12-col projection +
    PKs (ref :241-248)."""
    oltp = _oltp(spark, sf_dir)
    return fact_source(oltp["ventas"], oltp["orden"], oltp["orden_producto"], oltp["productos"])
