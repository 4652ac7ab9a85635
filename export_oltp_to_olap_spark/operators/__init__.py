"""Relational operators the engine adds on top of Spark built-ins."""

from export_oltp_to_olap_spark.operators.dedup import latest_by_key
from export_oltp_to_olap_spark.operators.surrogate import add_surrogate_key
from export_oltp_to_olap_spark.operators.ri_repair import repair_missing_dims

__all__ = ["latest_by_key", "add_surrogate_key", "repair_missing_dims"]
