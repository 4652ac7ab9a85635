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
    weight_col: str | None = None,
) -> DataFrame:
    """Collapse a change feed into Type-2 versions.

    ``changes``: one row per observation (e.g. the J2 customer⟕order
    fan-out, one row per order).  Consecutive rows (by ``seq_col``)
    with identical ``attr_cols`` merge into one version; reverting to
    an earlier value later starts a NEW version (true Type-2, not
    distinct-values).  Returns one row per version: key, attrs,
    ``version_seq`` (1-based), ``valid_from``/``valid_to`` (sequence
    values; ``valid_to`` NULL on the current version), ``is_current``.

    ``weight_col``: optional per-row observation weight —
    ``n_observations`` becomes the weight sum instead of the row count
    (`scd2_apply_delta` uses this to let one pseudo-row stand for an
    already-collapsed version).
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
    weight = F.col(weight_col) if weight_col else F.lit(1)
    versions = versioned.groupBy(key_col, "version_seq", *attr_cols).agg(
        F.min(seq_col).alias("valid_from"),
        F.sum(weight).cast("long").alias("n_observations"),
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


def scd2_apply_delta(
    existing: DataFrame,
    delta: DataFrame,
    key_col: str,
    seq_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Merge an append-only change batch into an existing Type-2 table.

    ``existing`` is a `scd2_versions` output; ``delta`` is new
    observations ``(key, seq, attrs)`` whose sequence values are — by
    the CDC append contract — strictly greater than every sequence
    already folded into ``existing`` for that key (out-of-order history
    would need a full rebuild of the affected keys; the nightly rebuild
    is exactly what this operator exists to avoid).

    Set-wise incremental shape: versions of keys the delta doesn't
    touch (the overwhelming majority of a 100 TB dimension) pass
    through UNTOUCHED — no window, no shuffle beyond the semi/anti
    join against the delta's (small, broadcastable) key set.  For
    touched keys, already-CLOSED versions also pass through; only each
    touched key's current version re-enters the gaps-and-islands fold,
    as one pseudo-observation at its ``valid_from`` carrying its
    observation count as weight, concatenated with the key's delta
    rows.  Result ≡ `scd2_versions` over the full concatenated history
    (pinned by the equivalence test for every prefix/suffix split).
    """
    touched = delta.select(key_col).distinct()
    untouched = existing.join(F.broadcast(touched), key_col, "left_anti")
    affected = existing.join(F.broadcast(touched), key_col, "left_semi")
    closed = affected.where(~F.col("is_current"))
    current = affected.where(F.col("is_current"))

    pseudo = current.select(
        key_col,
        F.col("valid_from").alias(seq_col),
        *attr_cols,
        F.col("n_observations").alias("__w"),
        (F.col("version_seq") - 1).alias("__base"),
    )
    delta_rows = delta.select(key_col, seq_col, *attr_cols).select(
        "*", F.lit(1).alias("__w"), F.lit(None).cast("long").alias("__base")
    )
    feed = pseudo.unionByName(delta_rows)
    # version offset per key: versions before the re-folded tail
    # (0 for keys the dimension has never seen).
    base = feed.groupBy(key_col).agg(
        F.coalesce(F.max("__base"), F.lit(0)).alias("__base")
    )
    tail = (
        scd2_versions(
            feed.drop("__base"), key_col, seq_col, attr_cols, weight_col="__w"
        )
        .join(F.broadcast(base), key_col)
        .withColumn("version_seq", (F.col("version_seq") + F.col("__base")).cast("long"))
        .drop("__base")
    )
    cols = [
        key_col,
        "version_seq",
        *attr_cols,
        "valid_from",
        "valid_to",
        "is_current",
        "n_observations",
    ]
    return (
        untouched.select(*cols)
        .unionByName(closed.select(*cols))
        .unionByName(tail.select(*cols))
        .orderBy(key_col, "version_seq")
    )


def dim_cliente_scd2_incremental(clientes: DataFrame, orden: DataFrame) -> DataFrame:
    """`dim_cliente_scd2` computed via the INCREMENTAL path: the change
    feed is split 80/20 on the sequence (deterministic in-plan cut at
    floor(0.8 × max id_orden)), the prefix folded with `scd2_versions`,
    the suffix merged with `scd2_apply_delta`.  Registered against the
    SAME full-rebuild SQL oracle as the batch face — the driver's
    value-hash check then verifies the incremental ≡ rebuild claim
    itself, not just a test fixture."""
    fanout = (
        clientes.select("id_cliente")
        .join(
            orden.select("id_cliente", "id_orden", "ciudad_envio", "pais_envio"),
            "id_cliente",
        )
        .select(
            "id_cliente",
            "id_orden",
            F.col("ciudad_envio").alias("ciudad"),
            F.col("pais_envio").alias("pais"),
        )
    )
    cut = fanout.agg(
        F.floor(F.max("id_orden") * 0.8).cast("long").alias("__cut")
    )
    with_cut = fanout.crossJoin(F.broadcast(cut))
    args = ("id_cliente", "id_orden", ("ciudad", "pais"))
    existing = scd2_versions(
        with_cut.where(F.col("id_orden") <= F.col("__cut")).drop("__cut"), *args
    )
    return scd2_apply_delta(
        existing, with_cut.where(F.col("id_orden") > F.col("__cut")).drop("__cut"), *args
    )
