"""Partitioning helpers: decouple CPU-heavy operators from input layout.

A small parquet file arrives as ONE input partition, so a plan whose
expensive work (md5 per shingle, per-pair dot products) happens *before
the first shuffle* runs single-threaded no matter how many cores exist —
observed 7s single-task stages on a 5k-doc corpus with 32 cores idle.
``spread_for_compute`` hash-repartitions such inputs up front so the
derivation parallelizes; the extra shuffle moves only the small source
rows, orders of magnitude less than the work it unlocks.

At cluster scale the same call is still right: it never *reduces*
parallelism below ``spark.sql.shuffle.partitions`` (which a 1000-executor
deployment sets in the thousands), and hashing on the row key evens out
file-skew before fan-out operators multiply it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_for_compute(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to max(cores, shuffle.partitions) by ``cols``
    (round-robin when no columns given)."""
    spark = df.sparkSession
    n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    if cols:
        return df.repartition(n, *[F.col(c) for c in cols])
    return df.repartition(n)
