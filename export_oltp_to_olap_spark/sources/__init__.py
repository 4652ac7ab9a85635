"""Source / sink connectors: parquet fixture catalog, JDBC, event feed."""

from export_oltp_to_olap_spark.sources.parquet import Catalog, load_tables

__all__ = ["Catalog", "load_tables"]
