"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``export_oltp_to_olap_spark.registry`` — every operator
from SURVEY.md §2 registers a (Spark plan, DuckDB oracle SQL) pair in
``export_oltp_to_olap_spark/queries_catalog.py``; this module re-exports
the dicts in the shape the driver expects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from export_oltp_to_olap_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from export_oltp_to_olap_spark.plans.flagship import flagship_revenue
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    tables = load_tables(
        spark, SF0001, ("region", "nation", "customer", "orders", "lineitem")
    )
    return flagship_revenue(tables)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return registry.oracle_sql()
