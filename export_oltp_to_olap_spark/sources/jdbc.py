"""JDBC source/sink — the production path for OLTP Postgres → OLAP Postgres.

The reference opens two psycopg2 connections from env vars (ref
``sync_oltp_to_olap.py:12-36``) and writes row-at-a-time
``INSERT ... ON CONFLICT DO UPDATE`` (ref ``:56-93``, ``:150-191``).
Spark-side replacements:

* **Read**: ``spark.read.format("jdbc")`` with ``partitionColumn`` /
  ``lowerBound`` / ``upperBound`` / ``numPartitions`` so a 100 TB-scale
  source is scanned by many executors in parallel instead of one cursor.
  Catalyst pushes filters into the generated remote SQL.
* **Write (upsert)**: Spark's JDBC writer has no ON CONFLICT mode, so the
  upsert sink is a ``foreachPartition`` that issues batched
  ``INSERT ... ON CONFLICT (keys) DO UPDATE SET col = EXCLUDED.col`` —
  one statement per batch of rows, executemany-style, preserving the
  reference's last-write-wins semantics (in-batch LWW is resolved
  *before* the write by operators.dedup.latest_by_key, so the sink never
  sees two rows with the same key).

This module is import-safe without a JDBC driver or psycopg2 on the
classpath: the test harness uses parquet; these functions raise cleanly
when their dependencies are absent.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Connection settings, typically sourced from env (ref :12-27)."""

    url: str  # e.g. jdbc:postgresql://host:5432/db
    user: str
    password: str
    driver: str = "org.postgresql.Driver"

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
        }


def read_jdbc_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """Parallel JDBC scan.

    Without ``partition_column`` the scan is a single cursor (fine for
    dimension-sized tables); with it, Spark issues ``numPartitions``
    range-predicated queries in parallel — the scan that replaces the
    reference's single ``SELECT *`` (ref :197-208).
    """
    reader = spark.read.format("jdbc").options(**cfg.options()).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            bounds = (
                spark.read.format("jdbc")
                .options(**cfg.options())
                .option(
                    "dbtable",
                    f"(SELECT min({partition_column}) lo, max({partition_column}) hi "
                    f"FROM {table}) b",
                )
                .load()
                .first()
            )
            lower_bound = int(bounds["lo"] or 0)
            upper_bound = int(bounds["hi"] or 1)
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def _pg_upsert_partition(rows, cfg: JdbcConfig, table: str, columns, key_columns, batch_size):
    """Executor-side: batched INSERT ... ON CONFLICT DO UPDATE.

    Mirrors the semantics of the reference upserts (ref :56-93) but in
    O(rows/batch_size) round trips instead of O(rows).
    """
    try:
        import psycopg2
        import psycopg2.extras
    except ImportError as exc:  # pragma: no cover - prod-only path
        raise RuntimeError(
            "psycopg2 is required for the Postgres upsert sink; the parquet "
            "harness path (operators.merge) needs no DB driver"
        ) from exc

    # jdbc:postgresql://host:port/db → libpq DSN
    dsn_host = cfg.url.split("//", 1)[1]
    hostport, dbname = dsn_host.split("/", 1)
    host, _, port = hostport.partition(":")
    conn = psycopg2.connect(
        host=host, port=port or 5432, dbname=dbname, user=cfg.user, password=cfg.password
    )
    try:
        updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in key_columns)
        conflict = ", ".join(key_columns)
        collist = ", ".join(columns)
        sql = (
            f"INSERT INTO {table} ({collist}) VALUES %s "
            f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
        )
        with conn.cursor() as cur:
            batch = []
            for row in rows:
                batch.append(tuple(row[c] for c in columns))
                if len(batch) >= batch_size:
                    psycopg2.extras.execute_values(cur, sql, batch)
                    batch.clear()
            if batch:
                psycopg2.extras.execute_values(cur, sql, batch)
        conn.commit()
    finally:
        conn.close()


def upsert_postgres(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    key_columns: list[str],
    batch_size: int = 1000,
    tiebreak: list[str] | None = None,
    partition_writer=None,
) -> None:
    """Distributed upsert sink (production analog of operators.merge).

    Each partition opens one connection and writes batched upserts; with
    N output partitions that is N parallel writers — repartition the
    DataFrame to the write-parallelism the target DB tolerates.

    In-batch LWW is resolved HERE, before the write: rows are deduped to
    one winner per key (``tiebreak`` columns descending pick it, making
    the reference's scan-order LWW deterministic), so ON CONFLICT never
    races two rows of the same key inside one statement — Postgres raises
    "cannot affect row a second time" if it does.

    ``partition_writer`` is injectable for contract tests (defaults to
    the psycopg2 executor-side writer).
    """
    from pyspark.sql import functions as F

    from export_oltp_to_olap_spark.operators.dedup import latest_by_key

    # Without a tiebreak the winner is arbitrary (the reference's
    # scan-order LWW); with one it is deterministic.
    order = [F.col(t).desc() for t in tiebreak] if tiebreak else [F.lit(1)]
    deduped = latest_by_key(df, list(key_columns), order)
    columns = deduped.columns
    writer = partition_writer or _pg_upsert_partition
    deduped.foreachPartition(
        lambda rows: writer(rows, cfg, table, columns, key_columns, batch_size)
    )
