"""File-format breadth: CSV / JSON(Lines) / parquet readers and writers.

The reference is DB-to-DB only (no file formats at all — SURVEY.md §2.A);
an analytics engine ingesting training data needs the common interchange
formats too.  Design rules:

* **Explicit schema always.**  Schema inference reads the data twice and
  guesses types per-file — at 100 TB that is a correctness and cost bug,
  not a convenience.  Readers here take a ``StructType`` (or a reference
  DataFrame to borrow one from).
* **Parquet is the canonical lake format**; CSV/JSON are ingest/egress
  edges.  Converters land data as parquet before heavy processing so
  later scans get column pruning, predicate pushdown, and row-group
  statistics that text formats cannot provide.
* Malformed rows: ``PERMISSIVE`` with a ``_corrupt_record`` column by
  default (K4 row-level error isolation, SURVEY.md §2.K4) — callers
  split valid/invalid instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Schema-applied CSV read; malformed rows captured, not fatal."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-applied JSON-lines read; malformed rows captured."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) — K4-style row-level error isolation.

    Caches the parsed frame: Spark refuses plans that read ONLY
    ``_corrupt_record`` from a raw text scan (the parser would have
    nothing to fail on), and the cache also stops the ingest from being
    parsed twice for the two sides of the split.
    """
    from pyspark.sql import functions as F

    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    valid = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    invalid = df.where(F.col(CORRUPT_COL).isNotNull())
    return valid, invalid


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC ingest — the columnar interchange format Hive/Trino lakes
    still hand over; Spark's reader is built in (predicate pushdown +
    column pruning work as with parquet, no extra packages)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def to_parquet_lake(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Land ingest data as the canonical lake format.

    ``partition_by`` maps to hive-style directory partitioning — the
    coarse pruning layer for 100 TB lakes (scan skips whole partitions
    before row-group stats even load).
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
