"""Derive reference-shaped OLTP tables from the driver fixtures.

The driver generates TPC-H-ish parquet (TESTDATA.md); the reference's ETL
consumes a Spanish e-commerce OLTP schema (FIXTURES.md §A).  This adapter
is the mapping in FIXTURES.md §D, made executable — every star-ETL plan
and its DuckDB oracle run over the *same* derived tables, so the ETL
semantics (joins, dedup, RI repair, surrogate keys) are what's tested,
not the mapping.

All derivations are deterministic column expressions (no UDFs, no
randomness) and have exact ANSI-SQL equivalents used by ``oracle_sql``.

Deliberate data properties:

* ``productos.id_categoria = p_partkey % 30`` while ``categoria`` holds
  ids 0..24 — products with category 25..29 reference a *missing*
  dimension member, exercising the reference's placeholder repair path
  (ref sync_oltp_to_olap.py:272-314) on real data.
* a customer with several orders fans out in the dim_cliente enrich join
  (ref :197-201) — orders per customer ≫ 1 in the fixtures.
* ``metodo_pago``/``estado_envio`` values repeat heavily → distinct-value
  dims are much smaller than their sources (ref :147-172).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clientes_from_customer(customer: DataFrame) -> DataFrame:
    """customer → clientes (FIXTURES.md §D row 1)."""
    return customer.select(
        F.col("c_custkey").alias("id_cliente"),
        F.col("c_name").alias("nombre"),
        F.col("c_mktsegment").alias("apellido"),
        F.col("c_nationkey").cast("int").alias("edad"),
        F.concat(
            F.lower(F.regexp_replace(F.col("c_name"), " ", ".")), F.lit("@example.com")
        ).alias("email"),
        F.col("c_custkey").cast("string").alias("telefono"),
        F.col("c_mktsegment").alias("direccion"),
    )


def categoria_from_nation(nation: DataFrame) -> DataFrame:
    """nation → categoria; descripcion encodes the region hierarchy."""
    return nation.select(
        F.col("n_nationkey").cast("long").alias("id_categoria"),
        F.col("n_name").alias("nombre_categoria"),
        F.concat(F.lit("region_"), F.col("n_regionkey").cast("string")).alias("descripcion"),
    )


def productos_from_part(part: DataFrame) -> DataFrame:
    """part → productos; ``% 30`` intentionally creates dangling FKs."""
    return part.select(
        F.col("p_partkey").alias("id_producto"),
        F.col("p_name").alias("nombre_producto"),
        F.col("p_type").alias("descripcion"),
        F.col("p_retailprice").alias("precio"),
        (F.col("p_retailprice") * F.lit(0.7)).alias("costo"),
        (F.col("p_partkey") % 30).alias("id_categoria"),
    )


def orden_from_orders(orders: DataFrame) -> DataFrame:
    """orders → orden (shipping attrs derived deterministically)."""
    return orders.select(
        F.col("o_orderkey").alias("id_orden"),
        F.col("o_custkey").alias("id_cliente"),
        F.col("o_orderstatus").alias("estado_envio"),
        F.col("o_orderpriority").alias("metodo_envio"),
        (F.col("o_totalprice") * F.lit(0.05)).alias("costo_envio"),
        F.concat(F.lit("city_"), (F.col("o_custkey") % 10).cast("string")).alias("ciudad_envio"),
        F.col("o_orderstatus").alias("pais_envio"),
    )


def orden_producto_from_lineitem(lineitem: DataFrame) -> DataFrame:
    """lineitem → orden_producto; PK packs (orderkey, linenumber)."""
    return lineitem.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id_op"),
        F.col("l_orderkey").alias("id_orden"),
        F.col("l_partkey").alias("id_producto"),
        F.col("l_quantity").alias("cantidad"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("precio_unitario"),
    )


def ventas_from_orders(orders: DataFrame) -> DataFrame:
    """orders → ventas (sale header: date + payment method)."""
    return orders.select(
        F.col("o_orderkey").alias("id_venta"),
        F.col("o_orderkey").alias("id_orden"),
        F.col("o_orderdate").alias("fecha_venta"),
        F.col("o_orderpriority").alias("metodo_pago"),
    )


def oltp_tables_from_fixtures(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Build all six reference-shaped OLTP tables from fixture DataFrames."""
    return {
        "clientes": clientes_from_customer(tables["customer"]),
        "categoria": categoria_from_nation(tables["nation"]),
        "productos": productos_from_part(tables["part"]),
        "orden": orden_from_orders(tables["orders"]),
        "orden_producto": orden_producto_from_lineitem(tables["lineitem"]),
        "ventas": ventas_from_orders(tables["orders"]),
    }


# ANSI-SQL CTE block defining the same six derived tables for DuckDB
# oracles.  Kept textually adjacent to the Spark derivations above so a
# reviewer can diff them line by line.
OLTP_CTE_SQL = """
oltp_clientes AS (
  SELECT c_custkey AS id_cliente,
         c_name AS nombre,
         c_mktsegment AS apellido,
         CAST(c_nationkey AS INTEGER) AS edad,
         lower(replace(c_name, ' ', '.')) || '@example.com' AS email,
         CAST(c_custkey AS VARCHAR) AS telefono,
         c_mktsegment AS direccion
  FROM customer
),
oltp_categoria AS (
  SELECT CAST(n_nationkey AS BIGINT) AS id_categoria,
         n_name AS nombre_categoria,
         'region_' || CAST(n_regionkey AS VARCHAR) AS descripcion
  FROM nation
),
oltp_productos AS (
  SELECT p_partkey AS id_producto,
         p_name AS nombre_producto,
         p_type AS descripcion,
         p_retailprice AS precio,
         p_retailprice * 0.7 AS costo,
         p_partkey % 30 AS id_categoria
  FROM part
),
oltp_orden AS (
  SELECT o_orderkey AS id_orden,
         o_custkey AS id_cliente,
         o_orderstatus AS estado_envio,
         o_orderpriority AS metodo_envio,
         o_totalprice * 0.05 AS costo_envio,
         'city_' || CAST(o_custkey % 10 AS VARCHAR) AS ciudad_envio,
         o_orderstatus AS pais_envio
  FROM orders
),
oltp_orden_producto AS (
  SELECT l_orderkey * 10 + l_linenumber AS id_op,
         l_orderkey AS id_orden,
         l_partkey AS id_producto,
         l_quantity AS cantidad,
         l_extendedprice / l_quantity AS precio_unitario
  FROM lineitem
),
oltp_ventas AS (
  SELECT o_orderkey AS id_venta,
         o_orderkey AS id_orden,
         o_orderdate AS fecha_venta,
         o_orderpriority AS metodo_pago
  FROM orders
)
""".strip()
