"""Column-level functions: date parts, measures, event decode, text analysis.

Everything here returns Spark ``Column`` expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python in
the hot path (SURVEY.md §2.J: no UDF is required for reference parity).
"""

from export_oltp_to_olap_spark.functions.dateparts import date_parts, to_fecha
from export_oltp_to_olap_spark.functions.measures import margen, total_venta
from export_oltp_to_olap_spark.functions.events import decode_cdc_event

__all__ = ["date_parts", "to_fecha", "margen", "total_venta", "decode_cdc_event"]
