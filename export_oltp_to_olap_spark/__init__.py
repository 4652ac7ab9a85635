"""export_oltp_to_olap_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference OLTP→OLAP ETL pipeline (``josuebushmaster/export-OLTP-to-OLAP``):
star-schema ETL (dimension builders, fact builder, referential-integrity
repair, grain dedup, idempotent merge), incremental per-key rebuild, and
event-driven CDC — plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal column plumbing).

Design principles (see SCALE.md):
  * DataFrame/SQL only — Catalyst owns optimization; no hand-scheduling.
  * No row-at-a-time Python in the hot path; Pandas UDFs where Python is
    genuinely required (multimodal decode), built-ins everywhere else.
  * Every operator designed for a 1000-executor / 100 TB deployment,
    validated for correctness on local[32] fixtures.
"""

from export_oltp_to_olap_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
