"""SparkSession factory.

Centralizes the configuration every entry point (tests, bench,
``__spark_entry__``) needs so plans are reproducible and oracle-comparable:

* ``spark.sql.session.timeZone=UTC`` — fixture timestamps are naive/UTC;
  DuckDB extracts date parts from naive timestamps, so Spark must agree.
* AQE on — runtime broadcast decisions, partition coalescing, skew-join
  splitting. At 100 TB this is the difference between a plan tuned for the
  average key and one that survives the hot key.
* ``spark.sql.shuffle.partitions`` defaults to ~cores locally; on a real
  cluster AQE's ``advisoryPartitionSizeInBytes`` takes over after the
  initial value, so the initial value is set high-ish and coalesced down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "export_oltp_to_olap_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for the test harness; production deployments pass their own master or
    rely on ``spark-submit``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[", 1)[1].rstrip("]*") or "32")
        except (IndexError, ValueError):
            n = 32
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Statistics-only answers for filterless count/min/max scans.
        # (Runtime bloom-filter join pruning and dynamic partition pruning
        # are already on by default in Spark 4 — verified, not re-set.)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
