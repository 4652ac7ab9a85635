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
    n_rows, n_present, present_millionths)`` ordered by column name —
    ``n_present`` counts non-NULL values, so a column added late (or
    sparsely populated) surfaces with a low ratio BEFORE a training
    run consumes it as if it were dense.

    ``present_millionths`` is an exact integer floor-division
    (``n_present·10⁶ div n_rows``, product in DECIMAL(38,0) so it
    cannot overflow at 100-TB row counts) — the zero-float-hash-surface
    discipline the `epoch_allocation` r10 red row taught; no
    ``round(double)`` column reaches a driver hash.

    One aggregation pass over the merged frame (count + per-column
    non-null counts are a single partial-agg shuffle); no per-column
    scans.
    """
    df = read_evolved_parquet(spark, *paths)
    return _drift_report_of(spark, df)


def _drift_report_of(spark: SparkSession, df: DataFrame) -> DataFrame:
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
        "present_millionths",
        F.expr(
            "(CAST(n_present AS DECIMAL(38,0)) * 1000000)"
            " div greatest(n_rows, 1)"
        ),
    )
    return out.orderBy("column")

# ---------------------------------------------------------------------------
# Registered driver face: drift audit over two REAL differently-schema'd
# parquet files from the test lake
# ---------------------------------------------------------------------------
#
# The driver's oracle SQL is a static string over pre-registered views, so
# the face simulates evolution with two existing files whose schemas
# differ (orders vs customer — zero shared columns, the extreme drift
# case): Spark reads them as ONE frame via mergeSchema, DuckDB mirrors
# with UNION ALL BY NAME over the same views.  `dtype` is excluded from
# the hashed face (engines spell type names differently); the module
# report keeps it.

AUDIT_TABLES = ("orders", "customer")
_AUDIT_COLUMNS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
    "c_custkey",
    "c_name",
    "c_nationkey",
    "c_acctbal",
    "c_mktsegment",
)


def schema_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered face: drift report over ``orders`` + ``customer``
    read as one evolved lake, without the engine-specific ``dtype``
    column."""
    rep = schema_drift_report(
        spark, *[f"{sf_dir}/{t}.parquet" for t in AUDIT_TABLES]
    )
    return rep.select("column", "n_rows", "n_present", "present_millionths")


def schema_drift_audit_sql() -> str:
    """DuckDB restatement: UNION ALL BY NAME (NULL backfill for absent
    columns — the same semantics as Spark's mergeSchema read), one
    aggregate pass, explicit per-column unpivot arms, HUGEINT
    floor-div millionths (integer-only hash surface)."""
    count_exprs = ",\n         ".join(
        f"count({c}) AS n_{c}" for c in _AUDIT_COLUMNS
    )
    arms = "\n  UNION ALL\n  ".join(
        f"SELECT '{c}' AS col, n_rows, n_{c} AS n_present FROM counts"
        for c in _AUDIT_COLUMNS
    )
    return f"""
WITH merged AS (
  SELECT * FROM {AUDIT_TABLES[0]}
  UNION ALL BY NAME
  SELECT * FROM {AUDIT_TABLES[1]}
),
counts AS (
  SELECT count(*) AS n_rows,
         {count_exprs}
  FROM merged
),
unpivoted AS (
  {arms}
)
SELECT col AS "column",
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_present AS BIGINT) AS n_present,
       CAST((CAST(n_present AS HUGEINT) * 1000000) // greatest(n_rows, 1)
            AS BIGINT) AS present_millionths
FROM unpivoted
ORDER BY "column"
""".strip()


SCHEMA_DRIFT_AUDIT_SQL = schema_drift_audit_sql()


def compact_to_union_schema(
    spark: SparkSession,
    out_path: str,
    *paths: str,
    target_files: int | None = None,
) -> int:
    """Lake maintenance: rewrite drifted batches into ONE directory
    whose every file carries the union schema (columns absent from old
    batches materialize as NULL).  After compaction, readers no longer
    need ``mergeSchema`` (a per-file footer union that costs a driver
    pass over ALL footers at planning time — real money on a
    100 TB / million-file lake); the schema is uniform on disk.

    Copy-on-write: the source batches are untouched; callers swap the
    blessed path atomically afterwards (the `operators/merge.py`
    publish discipline).  ``target_files`` optionally repartitions to
    bound the output file count (small-files control, the
    `sources/layout.py` concern); default preserves input parallelism.
    Returns the row count written (one action — the write itself).
    """
    df = read_evolved_parquet(spark, *paths)
    if target_files is not None:
        df = df.repartition(target_files)
    df.write.mode("overwrite").parquet(out_path)
    out = spark.read.parquet(out_path)
    assert out.columns == df.columns
    return out.count()
