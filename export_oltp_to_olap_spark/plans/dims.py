"""Dimension builders — set-wise re-expression of the reference's per-row
upsert loops (ref ``sync_oltp_to_olap.py:194-236``, ``:95-172``).

Each builder takes reference-shaped OLTP DataFrames and returns the OLAP
dimension DataFrame.  All are pure column expressions + joins/windows —
Catalyst handles pushdown and broadcast decisions; no Python per row.

Surrogate-key policy (SURVEY.md §4.3.2): dimensions built from distinct
value sets (tiempo, metodo_pago, envio) get ``dense_rank`` surrogate keys
ordered by natural key — deterministic, compact, and cheap because the
ranked set is the *distinct* set (small).  ``xxhash64`` mode is available
for dimensions too large to sort globally (100 TB path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.dateparts import date_parts, to_fecha
from export_oltp_to_olap_spark.operators.dedup import latest_by_key
from export_oltp_to_olap_spark.operators.surrogate import add_surrogate_key


def build_dim_cliente(clientes: DataFrame, orden: DataFrame) -> DataFrame:
    """dim_cliente: customer enriched with latest shipping city/country.

    The reference left-joins clientes to orden and lets ON CONFLICT keep
    whichever joined row arrives last — Postgres scan order, i.e.
    nondeterministic (ref :194-212; SURVEY.md §2.J2).  Here the winner is
    deterministic: the order with the highest ``id_orden`` per customer.
    """
    enrich = orden.select("id_cliente", "id_orden", "ciudad_envio", "pais_envio")
    joined = clientes.join(enrich, on="id_cliente", how="left")
    dedup = latest_by_key(
        joined, ["id_cliente"], [F.col("id_orden").desc_nulls_last()]
    )
    return dedup.select(
        "id_cliente",
        "nombre",
        "apellido",
        "edad",
        "email",
        "telefono",
        "direccion",
        F.col("ciudad_envio").alias("ciudad"),
        F.col("pais_envio").alias("pais"),
    )


def build_dim_categoria(categoria: DataFrame) -> DataFrame:
    """dim_categoria: straight projection + in-batch LWW on the key
    (ref :215-224; key conflict target :74)."""
    return latest_by_key(
        categoria.select("id_categoria", "nombre_categoria", "descripcion"),
        ["id_categoria"],
        [F.col("nombre_categoria").asc_nulls_first()],
    )


def build_dim_producto(productos: DataFrame) -> DataFrame:
    """dim_producto (ref :227-236; key conflict target :86)."""
    return latest_by_key(
        productos.select(
            "id_producto", "nombre_producto", "descripcion", "precio", "costo", "id_categoria"
        ),
        ["id_producto"],
        [F.col("nombre_producto").asc_nulls_first()],
    )


def build_dim_tiempo(ventas: DataFrame, sk_mode: str = "dense_rank") -> DataFrame:
    """dim_tiempo from distinct sale dates (ref :95-145, D2).

    The reference's SELECT-before-INSERT per date collapses to one
    ``distinct()`` over ``to_date(fecha_venta)``; date parts F2-F6 are
    derived set-wise; surrogate ``id_tiempo`` is dense_rank by fecha
    (chronological ids, like a sequence fed sorted dates).
    """
    fechas = ventas.select(to_fecha("fecha_venta").alias("fecha")).where(
        F.col("fecha").isNotNull()
    ).distinct()
    dim = add_surrogate_key(fechas, ["fecha"], "id_tiempo", mode=sk_mode)
    parts = date_parts(F.col("fecha"))
    return dim.select(
        "id_tiempo",
        "fecha",
        *[parts[name].alias(name) for name in ("anio", "mes", "dia", "trimestre", "semana")],
    )


def build_dim_metodo_pago(ventas: DataFrame, sk_mode: str = "dense_rank") -> DataFrame:
    """dim_metodo_pago from distinct payment methods (ref :147-158, D1).

    Empty string is a valid member distinct from NULL (ref :149); NULL
    itself is excluded (the reference only upserts when the fact row has
    a value — NULL never reaches the dim, ref :315 guard).
    """
    vals = (
        ventas.select("metodo_pago")
        .where(F.col("metodo_pago").isNotNull())
        .distinct()
    )
    dim = add_surrogate_key(vals, ["metodo_pago"], "id_metodo_pago", mode=sk_mode)
    return dim.select("id_metodo_pago", "metodo_pago")


def build_dim_envio(orden: DataFrame, sk_mode: str = "dense_rank") -> DataFrame:
    """dim_envio from distinct (estado_envio, metodo_envio) pairs
    (ref :160-172, D1).  Pairs with either side NULL are excluded, matching
    the reference's guard at :316; empty strings are valid (ref :162)."""
    pairs = (
        orden.select("estado_envio", "metodo_envio")
        .where(F.col("estado_envio").isNotNull() & F.col("metodo_envio").isNotNull())
        .distinct()
    )
    dim = add_surrogate_key(pairs, ["estado_envio", "metodo_envio"], "id_envio", mode=sk_mode)
    return dim.select("id_envio", "estado_envio", "metodo_envio")
