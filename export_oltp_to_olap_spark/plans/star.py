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

import os
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
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
    """The seven OLAP DataFrames, lazily composed.

    ``sk_mode`` records which surrogate-key scheme built the surrogate-keyed
    dims — persisted alongside written targets so a later merge can refuse
    to mix key spaces (dense_rank ids are relative to the slice that built
    them; xxhash64 ids are global — SURVEY.md §7.4).
    """

    dim_cliente: DataFrame
    dim_categoria: DataFrame
    dim_producto: DataFrame
    dim_tiempo: DataFrame
    dim_metodo_pago: DataFrame
    dim_envio: DataFrame
    hecho_ventas: DataFrame
    sk_mode: str = "dense_rank"

    def tables(self) -> dict[str, DataFrame]:
        return {name: getattr(self, name) for name in STAR_WRITE_ORDER}


def build_star(
    oltp: dict[str, DataFrame],
    sk_mode: str = "dense_rank",
    repair: bool = True,
    keep_lineage: bool = False,
) -> StarSchema:
    """Build the whole star from reference-shaped OLTP DataFrames.

    RI repair (ref :272-314): after building dims from their own sources,
    extend dim_categoria / dim_cliente / dim_producto with null-filled
    placeholders for any FK the fact carries that the dim lacks, so every
    fact row's FK resolves — set-wise left-anti instead of per-row probes.

    ``repair=False`` skips placeholder generation — the dim-only
    incremental path (ref ``_sync_clientes``/``_sync_categorias``/
    ``_sync_productos`` upsert their dimension without touching the fact,
    ref :194-236); repairing there against an unrestricted fact source
    would mint placeholders for every key outside the slice.
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
        keep_lineage=keep_lineage,
    )

    if repair:
        src = fact_source(
            oltp["ventas"], oltp["orden"], oltp["orden_producto"], oltp["productos"]
        )
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
        sk_mode=sk_mode,
    )


# ---------------------------------------------------------------------------
# Incremental dispatcher (ref :348-404)
# ---------------------------------------------------------------------------


def _fact_slice(
    oltp: dict[str, DataFrame], ventas_r: DataFrame, affected_orders: DataFrame
) -> dict[str, DataFrame]:
    """Restrict every OLTP input to the slice one set of changed orders
    touches.  ``productos``/``clientes`` are narrowed by semi-joins so the
    dim builders re-emit only affected members — safe for the fact chain
    because the fact's inner joins can only reach products on affected
    order lines and customers owning affected orders anyway.  The customer
    narrowing is the reference's orden→cliente cascade (ref :379-386) done
    set-wise."""
    out = dict(oltp)
    out["ventas"] = ventas_r
    owners = (
        oltp["orden"]
        .join(F.broadcast(affected_orders), on="id_orden", how="left_semi")
        .select("id_cliente")
        .where(F.col("id_cliente").isNotNull())
        .distinct()
    )
    out["clientes"] = oltp["clientes"].join(
        F.broadcast(owners), on="id_cliente", how="left_semi"
    )
    affected_products = (
        oltp["orden_producto"]
        .join(F.broadcast(affected_orders), on="id_orden", how="left_semi")
        .select("id_producto")
        .where(F.col("id_producto").isNotNull())
        .distinct()
    )
    out["productos"] = oltp["productos"].join(
        F.broadcast(affected_products), on="id_producto", how="left_semi"
    )
    return out


def filter_oltp_for_keys(
    oltp: dict[str, DataFrame], table: str, record_ids: Sequence[int]
) -> dict[str, DataFrame]:
    """Restrict the OLTP inputs to the slice affected by a set of changed
    records — the set-wise form of the reference's ``WHERE pk = %s``
    interpolation (ref :203-208, :220, :232, :250-255).  Catalyst pushes
    the resulting IN-filters into the source scans (JDBC pushdown /
    parquet row-group pruning); CDC micro-batches keep the key sets small.

    Routing (ref :367-404):
      * clientes/categoria/productos → those dimensions' source rows
      * ventas → fact rows of those sales
      * orden → fact rows of those orders + the owning customers
        (cascade, ref :379-386)
      * orden_producto → fact rows of the parent orders (PK probe,
        ref :387-401)
      * unknown table → full rebuild (ref :402-404)
    """
    ids = [int(i) for i in record_ids]
    if not ids:
        return oltp
    t = table.lower()
    out = dict(oltp)
    if t == "clientes":
        out["clientes"] = oltp["clientes"].where(F.col("id_cliente").isin(ids))
    elif t == "categoria":
        out["categoria"] = oltp["categoria"].where(F.col("id_categoria").isin(ids))
    elif t == "productos":
        out["productos"] = oltp["productos"].where(F.col("id_producto").isin(ids))
    elif t == "ventas":
        ventas_r = oltp["ventas"].where(F.col("id_venta").isin(ids))
        return _fact_slice(oltp, ventas_r, ventas_r.select("id_orden").distinct())
    elif t == "orden":
        ventas_r = oltp["ventas"].where(F.col("id_orden").isin(ids))
        affected = oltp["orden"].where(F.col("id_orden").isin(ids)).select("id_orden").distinct()
        return _fact_slice(oltp, ventas_r, affected)
    elif t == "orden_producto":
        pk = resolve_orden_producto_pk(oltp["orden_producto"])
        parents = (
            oltp["orden_producto"].where(F.col(pk).isin(ids)).select("id_orden").distinct()
        )
        ventas_r = oltp["ventas"].join(F.broadcast(parents), on="id_orden", how="left_semi")
        return _fact_slice(oltp, ventas_r, parents)
    else:
        # unknown table → full sync fallback (ref :402-404)
        return oltp
    return out


def filter_oltp_for_key(
    oltp: dict[str, DataFrame], table: str, record_id: int | None
) -> dict[str, DataFrame]:
    """Single-record form of :func:`filter_oltp_for_keys` (ref §3.2)."""
    if record_id is None:
        return oltp
    return filter_oltp_for_keys(oltp, table, [record_id])


# ---------------------------------------------------------------------------
# Star persistence: initial load + idempotent merge (ref ON CONFLICT keys)
# ---------------------------------------------------------------------------

# Business/merge key per OLAP table — the reference's ON CONFLICT targets
# (ref :59, :74, :86, :117 via fecha, :153, :167, :181).
STAR_MERGE_KEYS: dict[str, tuple[str, ...]] = {
    "dim_cliente": ("id_cliente",),
    "dim_categoria": ("id_categoria",),
    "dim_producto": ("id_producto",),
    "dim_tiempo": ("fecha",),
    "dim_metodo_pago": ("metodo_pago",),
    "dim_envio": ("estado_envio", "metodo_envio"),
    "hecho_ventas": (
        "id_tiempo",
        "id_cliente",
        "id_producto",
        "id_categoria",
        "id_metodo_pago",
        "id_envio",
    ),
}


def star_table_path(target_dir: str, name: str) -> str:
    return os.path.join(target_dir, name)


_STAR_META_FILE = "_star_meta.json"


def _read_star_meta(target_dir: str) -> dict | None:
    import json

    meta_path = os.path.join(target_dir, _STAR_META_FILE)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path, encoding="utf-8") as fh:
        return json.load(fh)


def _write_star_meta(target_dir: str, sk_mode: str) -> None:
    import json

    os.makedirs(target_dir, exist_ok=True)
    meta_path = os.path.join(target_dir, _STAR_META_FILE)
    with open(meta_path, "w", encoding="utf-8") as fh:
        json.dump({"sk_mode": sk_mode}, fh)


def _check_sk_mode(star: StarSchema, target_dir: str, overwrite: bool) -> None:
    """Refuse to mix surrogate-key spaces in one stored star.

    dense_rank ids are relative to the slice that built them; xxhash64
    ids are global.  An initial dense_rank load followed by an xxhash64
    CDC merge (or vice versa) would silently interleave two key spaces —
    the library-API hole the CLI already guards (cli.py sk_mode notice).
    The written ``_star_meta.json`` makes the stored mode first-class.
    """
    meta = None if overwrite else _read_star_meta(target_dir)
    if meta is not None and meta.get("sk_mode") not in (None, star.sk_mode):
        raise ValueError(
            f"stored star at {target_dir} was built with "
            f"sk_mode={meta['sk_mode']!r}; merging a {star.sk_mode!r} slice "
            "would mix surrogate-key spaces — rebuild with --full-refresh "
            "or build the slice with the stored mode"
        )
    _write_star_meta(target_dir, star.sk_mode)


def write_star(
    star: StarSchema, target_dir: str, tables: Sequence[str] | None = None
) -> None:
    """Initial full load: overwrite each OLAP table, dims before fact
    (the reference's FK topological order, ref :337-345)."""
    _check_sk_mode(star, target_dir, overwrite=tables is None)
    for name in STAR_WRITE_ORDER:
        if tables is not None and name not in tables:
            continue
        getattr(star, name).write.mode("overwrite").parquet(
            star_table_path(target_dir, name)
        )


def merge_star(
    spark: SparkSession,
    star: StarSchema,
    target_dir: str,
    tables: Sequence[str] | None = None,
) -> None:
    """Idempotent key-merge of (a slice of) the star into stored targets —
    the cross-batch ON CONFLICT semantics (ref :56-93, :150-191), dims
    before fact.  Raises if the stored star was built with a different
    ``sk_mode`` (key-space mixing guard)."""
    from export_oltp_to_olap_spark.operators.merge import merge_into_parquet

    _check_sk_mode(star, target_dir, overwrite=False)
    for name in STAR_WRITE_ORDER:
        if tables is not None and name not in tables:
            continue
        merge_into_parquet(
            spark,
            getattr(star, name),
            star_table_path(target_dir, name),
            STAR_MERGE_KEYS[name],
        )


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
