"""Slowly-changing-dimension Type 2: versioned history from a change
sequence.

The reference's dimension upserts are SCD Type 1 — last write wins, old
attribute values destroyed (ref sync_oltp_to_olap.py:56-93: every
``ON CONFLICT DO UPDATE`` overwrites).  Type 2 keeps one row per
distinct run of attribute values with validity bounds — the standard
warehouse answer to "what did this customer's record say when the order
shipped".  This module derives Type-2 history set-wise from any
(key, sequence, attrs) change feed:

1. per key, order changes by the sequence column;
2. gaps-and-islands: a row starts a new version iff any tracked
   attribute differs from the previous row (null-safe comparison);
3. each island becomes one version with ``valid_from`` / ``valid_to``
   (next version's start; NULL = current) and ``is_current``.

Scale: one shuffle on the key, two window passes over the same
(key, seq) sort (Catalyst reuses the exchange+sort), one aggregation on
(key, version) — no self-joins, no collects.  Exactly the time-series
layout: each key's history sorts within one partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Collapse a change feed into Type-2 versions.

    ``changes``: one row per observation (e.g. the J2 customer⟕order
    fan-out, one row per order).  Consecutive rows (by ``seq_col``)
    with identical ``attr_cols`` merge into one version; reverting to
    an earlier value later starts a NEW version (true Type-2, not
    distinct-values).  Returns one row per version: key, attrs,
    ``version_seq`` (1-based), ``valid_from``/``valid_to`` (sequence
    values; ``valid_to`` NULL on the current version), ``is_current``.
    """
    w = Window.partitionBy(key_col).orderBy(seq_col)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.lag(F.col(seq_col)).over(w).isNull()
    flagged = changes.withColumn("__new_version", (first | changed).cast("int"))
    versioned = flagged.withColumn(
        "version_seq",
        F.sum("__new_version").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    versions = versioned.groupBy(key_col, "version_seq", *attr_cols).agg(
        F.min(seq_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_observations"),
    )
    wv = Window.partitionBy(key_col).orderBy("version_seq")
    return versions.select(
        key_col,
        "version_seq",
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_observations",
    ).orderBy(key_col, "version_seq")


def dim_cliente_scd2(clientes: DataFrame, orden: DataFrame) -> DataFrame:
    """Type-2 shipping-destination history per customer from the J2
    fan-out the reference destroys with last-write-wins (ref :197-212):
    one version per run of (ciudad, pais) across the customer's orders
    in id_orden sequence."""
    fanout = clientes.select("id_cliente").join(
        orden.select("id_cliente", "id_orden", "ciudad_envio", "pais_envio"),
        "id_cliente",
    )
    return scd2_versions(
        fanout.select(
            "id_cliente",
            "id_orden",
            F.col("ciudad_envio").alias("ciudad"),
            F.col("pais_envio").alias("pais"),
        ),
        key_col="id_cliente",
        seq_col="id_orden",
        attr_cols=("ciudad", "pais"),
    )


# DuckDB restatement over the fixture-derived clientes/orden (the same
# derivations as star_oracle's CTEs — city from custkey, pais = status).
DIM_CLIENTE_SCD2_SQL = """
WITH fanout AS (
  SELECT o.o_custkey AS id_cliente,
         o.o_orderkey AS id_orden,
         'city_' || CAST(o.o_custkey % 10 AS VARCHAR) AS ciudad,
         o.o_orderstatus AS pais
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
),
flagged AS (
  SELECT *,
         CASE WHEN lag(id_orden) OVER w IS NULL
                OR NOT (ciudad IS NOT DISTINCT FROM lag(ciudad) OVER w
                        AND pais IS NOT DISTINCT FROM lag(pais) OVER w)
              THEN 1 ELSE 0 END AS new_version
  FROM fanout
  WINDOW w AS (PARTITION BY id_cliente ORDER BY id_orden)
),
versioned AS (
  SELECT *,
         CAST(SUM(new_version) OVER (
             PARTITION BY id_cliente ORDER BY id_orden
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version_seq
  FROM flagged
),
versions AS (
  SELECT id_cliente, version_seq, ciudad, pais,
         min(id_orden) AS valid_from,
         count(*) AS n_observations
  FROM versioned
  GROUP BY id_cliente, version_seq, ciudad, pais
)
SELECT id_cliente,
       version_seq,
       ciudad,
       pais,
       valid_from,
       lead(valid_from) OVER wv AS valid_to,
       lead(valid_from) OVER wv IS NULL AS is_current,
       n_observations
FROM versions
WINDOW wv AS (PARTITION BY id_cliente ORDER BY version_seq)
ORDER BY id_cliente, version_seq
"""
