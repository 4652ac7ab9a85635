"""Fact builder — hecho_ventas (ref ``sync_oltp_to_olap.py:239-334``).

The reference builds the fact row-at-a-time: a 4-way join streamed from
Postgres, then *per row* ≤3 dimension point-SELECTs, ≤6 upserts, and the
measure arithmetic (SURVEY.md §4.2 — the N+1 pattern).  The Spark plan is
a constant number of set-wise stages, independent of fact cardinality:

1. 4-way join ventas ⋈ orden ⋈ orden_producto ⋈ productos (J3)
2. surrogate-key resolution via broadcast joins on natural keys (J5)
3. null-guard: keep rows whose 6 dimension keys all resolved (B5)
4. measures total_venta / margen (F8/F9)
5. grain dedup: one row per 6-key grain, deterministic LWW (J1/D3)

Scale: the only big-data shuffles are the fact-side joins on
``id_orden``/``id_producto``; dimension joins broadcast (dims are small
by construction — distinct value sets).  AQE picks broadcast
automatically at runtime; explicit ``F.broadcast`` documents intent on
the three natural-key dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.dateparts import to_fecha
from export_oltp_to_olap_spark.functions.measures import margen, total_venta
from export_oltp_to_olap_spark.operators.dedup import latest_by_key
from export_oltp_to_olap_spark.schemas import FACT_GRAIN


def fact_source(
    ventas: DataFrame,
    orden: DataFrame,
    orden_producto: DataFrame,
    productos: DataFrame,
) -> DataFrame:
    """The reference's 4-way fact-source join with its exact 12-column
    projection (ref :241-248, B2) plus the source PKs used as the
    deterministic dedup tiebreak."""
    return (
        ventas.alias("v")
        .join(orden.alias("o"), on="id_orden", how="inner")
        .join(orden_producto.alias("op"), on="id_orden", how="inner")
        .join(productos.alias("p"), on=F.col("op.id_producto") == F.col("p.id_producto"), how="inner")
        .select(
            F.col("v.id_venta"),
            F.col("op.id_op"),
            F.col("v.fecha_venta"),
            F.col("o.id_cliente"),
            F.col("op.id_producto"),
            F.col("p.id_categoria"),
            F.col("v.metodo_pago"),
            F.col("o.estado_envio"),
            F.col("o.metodo_envio"),
            F.col("op.cantidad"),
            F.col("op.precio_unitario"),
            F.col("p.precio"),
            F.col("p.costo"),
            F.col("o.costo_envio"),
        )
    )


def build_hecho_ventas(
    ventas: DataFrame,
    orden: DataFrame,
    orden_producto: DataFrame,
    productos: DataFrame,
    dim_tiempo: DataFrame,
    dim_metodo_pago: DataFrame,
    dim_envio: DataFrame,
    keep_lineage: bool = False,
) -> DataFrame:
    """Assemble the fact table at the reference's 6-key grain (ref :177-191).

    ``id_cliente``/``id_producto``/``id_categoria`` ride along from the
    source (business key = surrogate key for those dims, as in the
    reference); ``id_tiempo``/``id_metodo_pago``/``id_envio`` resolve via
    broadcast joins on their natural keys (J5, replacing the per-row
    RETURNING round-trips at ref :266, :315-316).

    ``keep_lineage`` retains the source PKs (``id_venta``, ``id_op``) on
    the output — the reference-parity schema drops them, but a
    CDC-managed star needs them to route DELETE tombstones back to the
    fact rows a source deletion produced (streaming/cdc.py).  The grain
    dedup's LWW winner supplies the surviving row's lineage.
    """
    src = fact_source(ventas, orden, orden_producto, productos)
    src = src.withColumn("fecha", to_fecha("fecha_venta"))

    resolved = (
        src.join(F.broadcast(dim_tiempo.select("id_tiempo", "fecha")), on="fecha", how="left")
        .join(F.broadcast(dim_metodo_pago), on="metodo_pago", how="left")
        .join(F.broadcast(dim_envio), on=["estado_envio", "metodo_envio"], how="left")
    )

    # B5 null-guard (ref :331-334): the reference uses Python all(),
    # which also drops falsy 0/'' keys; surrogate ids here are >=1 and
    # business ids nonzero in the fixtures, so null-check ≡ truthiness
    # (divergence documented in SURVEY.md §7.4).
    guard = F.lit(True)
    for k in FACT_GRAIN:
        guard = guard & F.col(k).isNotNull()

    measured = resolved.where(guard).select(
        *FACT_GRAIN,
        F.col("cantidad"),
        total_venta("cantidad", "precio_unitario").alias("total_venta"),
        F.col("costo_envio"),
        margen("precio_unitario", "costo", "cantidad").alias("margen"),
        F.col("id_venta"),
        F.col("id_op"),
    )

    # J1/D3 grain dedup, deterministic LWW: highest (id_venta, id_op) wins.
    deduped = latest_by_key(
        measured, FACT_GRAIN, [F.col("id_venta").desc(), F.col("id_op").desc()]
    )
    return deduped if keep_lineage else deduped.drop("id_venta", "id_op")
