"""Parquet catalog over a fixture directory.

The driver harness stores each table as ``{sf_dir}/{name}.parquet``
(TESTDATA.md).  ``Catalog`` lazily exposes them as DataFrames; reads are
plain ``spark.read.parquet`` so Catalyst's parquet source gets full
predicate pushdown / column pruning (check with ``.explain``: the scan
node shows ``PushedFilters`` and a pruned ``ReadSchema``).

At 100 TB the same interface is backed by a partitioned lakehouse table
(directory-partitioned or Iceberg/Delta); nothing downstream changes
because consumers only see DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

KNOWN_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy table catalog over one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return os.path.join(self.sf_dir, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            path = self.path(name)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"fixture table {name!r} not found at {path} "
                    f"(sf_dir={self.sf_dir!r})"
                )
            self._cache[name] = self._read(path)
        return self._cache[name]

    def _read(self, path: str) -> DataFrame:
        """Read one parquet table, normalizing timestamp physical types.

        Fixture generations have stored ``ts`` as TIMESTAMP(NANOS) and as
        TIMESTAMP(MICROS) without timezone; both are normalized to plain
        TIMESTAMP so every downstream operator (``unix_micros``, window
        ranges, watermarking) sees one type:

        * NANOS — Spark's reader rejects it; with ``nanosAsLong`` it
          surfaces as LongType nanos and is floor-divided to micros
          (integer ``div`` — a double division would lose precision above
          2^53 ns), matching DuckDB's read-time truncation exactly.
        * MICROS/no-tz — Spark 4 infers TIMESTAMP_NTZ, which functions
          like ``unix_micros`` reject; cast to TIMESTAMP.  The session
          timezone is pinned to UTC (``session.py``), so the cast is
          value-identical to DuckDB's naive read.
        """
        from pyspark.sql import functions as F

        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(path)
        for field, dtype in df.dtypes:
            if field == "ts" and dtype == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif dtype == "timestamp_ntz":
                df = df.withColumn(field, F.col(field).cast("timestamp"))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in KNOWN_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, names: tuple[str, ...] = KNOWN_TABLES) -> None:
        """Register every table as a temp view for the SQL API."""
        for n in names:
            if os.path.exists(self.path(n)):
                self.table(n).createOrReplaceTempView(n)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = KNOWN_TABLES
) -> dict[str, DataFrame]:
    """Eagerly build the name→DataFrame dict for the given tables."""
    cat = Catalog(spark, sf_dir)
    return {n: cat.table(n) for n in names}
