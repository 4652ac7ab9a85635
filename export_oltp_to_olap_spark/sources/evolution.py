"""Schema evolution on the parquet lake: read batches written under
DIFFERENT schema versions as one coherent frame, and report the drift.

A 100 TB corpus is not written once — ingest batches accrete columns
over months (a new quality score, a new provenance tag), and a reader
pinned to any single batch's schema either crashes on old files
(missing column) or silently drops new ones.  Spark's parquet reader
already solves the mechanics (``mergeSchema`` unions the per-file
schemas; files lacking a column yield NULLs); what a pipeline needs on
top is (a) one blessed entry point so every reader gets the same
union-schema behavior and (b) an AUDIT of which columns are partial —
a column present in only 3 % of the lake is a red flag before
training, not after.

Cite: reference `sync_oltp_to_olap.py` reads fixed OLTP schemas and has
no evolution story; this module is engine surface (north-star: the lake
outlives any one schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_evolved_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Read one-or-more parquet batch directories written under
    different schema versions as ONE frame with the UNION schema;
    columns absent from older batches read as NULL.  Pure reader
    option — no rewrite of the old files, which at 100 TB is the whole
    point."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def schema_drift_report(spark: SparkSession, *paths: str) -> DataFrame:
    """Per-column presence audit across the lake: ``(column, dtype,
    n_rows, n_present, present_ratio)`` ordered by column name —
    ``n_present`` counts non-NULL values, so a column added late (or
    sparsely populated) surfaces with a low ratio BEFORE a training
    run consumes it as if it were dense.

    One aggregation pass over the merged frame (count + per-column
    non-null counts are a single partial-agg shuffle); no per-column
    scans.
    """
    df = read_evolved_parquet(spark, *paths)
    counts = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(F.col(c)).alias(f"_c_{i}") for i, c in enumerate(df.columns)],
    ).first()
    n = int(counts["_n"])
    rows = [
        (c, df.schema[c].dataType.simpleString(), n, int(counts[f"_c_{i}"]))
        for i, c in enumerate(df.columns)
    ]
    out = spark.createDataFrame(
        rows, "column string, dtype string, n_rows long, n_present long"
    ).withColumn(
        "present_ratio",
        F.round(F.col("n_present") / F.greatest(F.col("n_rows"), F.lit(1)), 6),
    )
    return out.orderBy("column")
