"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the fact↔fact join (e.g. lineitem ⋈ orders on orderkey) pays a
full shuffle of both sides every query.  Bucketing pre-partitions the
stored table by the join key into a fixed number of buckets; two tables
bucketed by the same key with the same bucket count join with NO exchange
— the shuffle is paid once at write time, amortized over every later
join/aggregation on that key.

Spark bucketing requires the table catalog (``saveAsTable``); plain
``.parquet(path)`` writes cannot carry bucket metadata.  Tests verify the
no-exchange property by inspecting the physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: Sequence[str],
    n_buckets: int = 32,
    sort_keys: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally removes the sort from later
    sort-merge joins — the scan is already in join order.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_keys)
    )
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
