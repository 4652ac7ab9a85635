"""Full star-schema build + incremental dispatcher.

Batch mode (ref ``sync_oltp_to_olap.py`` no-args path, SURVEY.md §3.1):
one lazily-composed Spark plan builds 6 dims + 1 fact; write order is
dims-before-fact (the reference's FK topological order, ref :337-345).

Incremental mode (ref ``--table/--op/--id`` path, SURVEY.md §3.2): the
same builders parameterized by a key predicate that Catalyst pushes into
the scans.  The ``--op`` value is accepted and ignored, exactly like the
reference (deletes are not propagated; everything is an upsert —
ref :416-423, SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.ri_repair import repair_missing_dims
from export_oltp_to_olap_spark.plans.dims import (
    build_dim_categoria,
    build_dim_cliente,
    build_dim_envio,
    build_dim_metodo_pago,
    build_dim_producto,
    build_dim_tiempo,
)
from export_oltp_to_olap_spark.plans.fact import build_hecho_ventas, fact_source

# Write order = FK topological order (ref :337-345, :357-366).
STAR_WRITE_ORDER = (
    "dim_cliente",
    "dim_categoria",
    "dim_producto",
    "dim_tiempo",
    "dim_metodo_pago",
    "dim_envio",
    "hecho_ventas",
)

ORDEN_PRODUCTO_PK_CANDIDATES = ("id_op", "id_orden_producto", "id")


def resolve_orden_producto_pk(orden_producto: DataFrame) -> str:
    """The reference probes the PK name by trial queries (ref :390-399);
    with first-class schemas it's a set intersection on ``df.columns``."""
    for cand in ORDEN_PRODUCTO_PK_CANDIDATES:
        if cand in orden_producto.columns:
            return cand
    raise ValueError(
        f"orden_producto has none of {ORDEN_PRODUCTO_PK_CANDIDATES}: {orden_producto.columns}"
    )


@dataclass
class StarSchema:
    """The seven OLAP DataFrames, lazily composed."""

    dim_cliente: DataFrame
    dim_categoria: DataFrame
    dim_producto: DataFrame
    dim_tiempo: DataFrame
    dim_metodo_pago: DataFrame
    dim_envio: DataFrame
    hecho_ventas: DataFrame

    def tables(self) -> dict[str, DataFrame]:
        return {name: getattr(self, name) for name in STAR_WRITE_ORDER}


def build_star(oltp: dict[str, DataFrame], sk_mode: str = "dense_rank") -> StarSchema:
    """Build the whole star from reference-shaped OLTP DataFrames.

    RI repair (ref :272-314): after building dims from their own sources,
    extend dim_categoria / dim_cliente / dim_producto with null-filled
    placeholders for any FK the fact carries that the dim lacks, so every
    fact row's FK resolves — set-wise left-anti instead of per-row probes.
    """
    dim_cliente = build_dim_cliente(oltp["clientes"], oltp["orden"])
    dim_categoria = build_dim_categoria(oltp["categoria"])
    dim_producto = build_dim_producto(oltp["productos"])
    dim_tiempo = build_dim_tiempo(oltp["ventas"], sk_mode=sk_mode)
    dim_metodo_pago = build_dim_metodo_pago(oltp["ventas"], sk_mode=sk_mode)
    dim_envio = build_dim_envio(oltp["orden"], sk_mode=sk_mode)

    fact = build_hecho_ventas(
        oltp["ventas"],
        oltp["orden"],
        oltp["orden_producto"],
        oltp["productos"],
        dim_tiempo,
        dim_metodo_pago,
        dim_envio,
    )

    src = fact_source(oltp["ventas"], oltp["orden"], oltp["orden_producto"], oltp["productos"])
    dim_categoria = repair_missing_dims(src, dim_categoria, ["id_categoria"])
    dim_cliente = repair_missing_dims(src, dim_cliente, ["id_cliente"])
    dim_producto = repair_missing_dims(src, dim_producto, ["id_producto"])

    return StarSchema(
        dim_cliente=dim_cliente,
        dim_categoria=dim_categoria,
        dim_producto=dim_producto,
        dim_tiempo=dim_tiempo,
        dim_metodo_pago=dim_metodo_pago,
        dim_envio=dim_envio,
        hecho_ventas=fact,
    )


# ---------------------------------------------------------------------------
# Incremental dispatcher (ref :348-404)
# ---------------------------------------------------------------------------


def filter_oltp_for_key(
    oltp: dict[str, DataFrame], table: str, record_id: int | None
) -> dict[str, DataFrame]:
    """Restrict the OLTP inputs to the slice affected by one changed record
    — the engine's form of the reference's ``WHERE pk = %s`` interpolation
    (ref :203-208, :220, :232, :250-255).  Catalyst pushes these filters
    into the source scans (JDBC pushdown / parquet row-group pruning).

    Routing (ref :367-404):
      * clientes/categoria/productos → that dimension's source row
      * ventas → fact rows of that sale
      * orden → fact rows of that order + the owning customer (cascade,
        ref :379-386)
      * orden_producto → fact rows of the parent order (PK probe,
        ref :387-401)
      * unknown table → full rebuild (ref :402-404)
    """
    if record_id is None:
        return oltp
    t = table.lower()
    out = dict(oltp)
    rid = F.lit(record_id)
    if t == "clientes":
        out["clientes"] = oltp["clientes"].where(F.col("id_cliente") == rid)
    elif t == "categoria":
        out["categoria"] = oltp["categoria"].where(F.col("id_categoria") == rid)
    elif t == "productos":
        out["productos"] = oltp["productos"].where(F.col("id_producto") == rid)
    elif t == "ventas":
        out["ventas"] = oltp["ventas"].where(F.col("id_venta") == rid)
    elif t == "orden":
        out["ventas"] = oltp["ventas"].where(F.col("id_orden") == rid)
        # cascade: refresh the customer owning this order (ref :379-386)
        owner = oltp["orden"].where(F.col("id_orden") == rid).select("id_cliente")
        out["clientes"] = oltp["clientes"].join(
            F.broadcast(owner), on="id_cliente", how="left_semi"
        )
    elif t == "orden_producto":
        pk = resolve_orden_producto_pk(oltp["orden_producto"])
        parent = (
            oltp["orden_producto"].where(F.col(pk) == rid).select("id_orden")
        )
        out["ventas"] = oltp["ventas"].join(
            F.broadcast(parent), on="id_orden", how="left_semi"
        )
    else:
        # unknown table → full sync fallback (ref :402-404)
        return oltp
    return out


def build_star_incremental(
    oltp: dict[str, DataFrame],
    table: str,
    operation: str | None = None,  # accepted, ignored (ref §3.2 note)
    record_id: int | None = None,
    sk_mode: str = "dense_rank",
) -> StarSchema:
    """Incremental rebuild: same plan, key-restricted inputs.

    The result's tables contain only the affected slice; merging them
    into stored targets is operators.merge (batch) or streaming.cdc
    (foreachBatch) — both idempotent, matching the reference's
    converge-on-re-sync behavior (SURVEY.md §2.I3).
    """
    del operation
    return build_star(filter_oltp_for_key(oltp, table, record_id), sk_mode=sk_mode)
