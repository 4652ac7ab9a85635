"""Explicit schemas for every table the engine touches.

The reference hard-codes its schemas as column lists inside SQL strings
(reference ``sync_oltp_to_olap.py:57,72,84,116,151,165,177-180``); here they
are first-class ``StructType`` values in one module so every reader, builder
and test agrees.  Two families:

* ``OLTP_*`` / ``OLAP_*`` — the reference's Spanish e-commerce shapes
  (FIXTURES.md §A/§B), used by the star-ETL plans and the CDC merge.
* ``FIXTURE_*`` — the driver-generated TPC-H-ish parquet fixtures
  (FIXTURES.md §C) that ``queries()`` / ``oracle_sql()`` run against.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference OLTP source shapes (FIXTURES.md §A; ref sync_oltp_to_olap.py:57-66,
# :72-78, :84-92, :198, :242-247, :242-251)
# ---------------------------------------------------------------------------

OLTP_CLIENTES = T.StructType(
    [
        T.StructField("id_cliente", T.LongType(), False),
        T.StructField("nombre", T.StringType(), True),
        T.StructField("apellido", T.StringType(), True),
        T.StructField("edad", T.IntegerType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("telefono", T.StringType(), True),
        T.StructField("direccion", T.StringType(), True),
    ]
)

OLTP_CATEGORIA = T.StructType(
    [
        T.StructField("id_categoria", T.LongType(), False),
        T.StructField("nombre_categoria", T.StringType(), True),
        T.StructField("descripcion", T.StringType(), True),
    ]
)

OLTP_PRODUCTOS = T.StructType(
    [
        T.StructField("id_producto", T.LongType(), False),
        T.StructField("nombre_producto", T.StringType(), True),
        T.StructField("descripcion", T.StringType(), True),
        T.StructField("precio", T.DoubleType(), True),
        T.StructField("costo", T.DoubleType(), True),
        T.StructField("id_categoria", T.LongType(), True),
    ]
)

OLTP_ORDEN = T.StructType(
    [
        T.StructField("id_orden", T.LongType(), False),
        T.StructField("id_cliente", T.LongType(), True),
        T.StructField("estado_envio", T.StringType(), True),
        T.StructField("metodo_envio", T.StringType(), True),
        T.StructField("costo_envio", T.DoubleType(), True),
        T.StructField("ciudad_envio", T.StringType(), True),
        T.StructField("pais_envio", T.StringType(), True),
    ]
)

# The reference probes the PK name at runtime (id_op | id_orden_producto | id,
# ref sync_oltp_to_olap.py:390-399); our reader accepts any of them (see
# plans/star.py:resolve_orden_producto_pk).
OLTP_ORDEN_PRODUCTO = T.StructType(
    [
        T.StructField("id_op", T.LongType(), False),
        T.StructField("id_orden", T.LongType(), True),
        T.StructField("id_producto", T.LongType(), True),
        T.StructField("cantidad", T.DoubleType(), True),
        T.StructField("precio_unitario", T.DoubleType(), True),
    ]
)

OLTP_VENTAS = T.StructType(
    [
        T.StructField("id_venta", T.LongType(), False),
        T.StructField("id_orden", T.LongType(), True),
        T.StructField("fecha_venta", T.TimestampType(), True),
        T.StructField("metodo_pago", T.StringType(), True),
    ]
)

OLTP_TABLES = {
    "clientes": OLTP_CLIENTES,
    "categoria": OLTP_CATEGORIA,
    "productos": OLTP_PRODUCTOS,
    "orden": OLTP_ORDEN,
    "orden_producto": OLTP_ORDEN_PRODUCTO,
    "ventas": OLTP_VENTAS,
}

# ---------------------------------------------------------------------------
# Reference OLAP star shapes (FIXTURES.md §B; ref :57-62, :72-75, :84-88,
# :101/:116-118, :151-155, :165-169, :177-186)
# ---------------------------------------------------------------------------

OLAP_DIM_CLIENTE = T.StructType(
    [
        T.StructField("id_cliente", T.LongType(), False),
        T.StructField("nombre", T.StringType(), True),
        T.StructField("apellido", T.StringType(), True),
        T.StructField("edad", T.IntegerType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("telefono", T.StringType(), True),
        T.StructField("direccion", T.StringType(), True),
        T.StructField("ciudad", T.StringType(), True),
        T.StructField("pais", T.StringType(), True),
    ]
)

OLAP_DIM_CATEGORIA = OLTP_CATEGORIA

OLAP_DIM_PRODUCTO = OLTP_PRODUCTOS

OLAP_DIM_TIEMPO = T.StructType(
    [
        T.StructField("id_tiempo", T.LongType(), False),
        T.StructField("fecha", T.DateType(), False),
        T.StructField("anio", T.IntegerType(), True),
        T.StructField("mes", T.IntegerType(), True),
        T.StructField("dia", T.IntegerType(), True),
        T.StructField("trimestre", T.IntegerType(), True),
        T.StructField("semana", T.IntegerType(), True),
    ]
)

OLAP_DIM_METODO_PAGO = T.StructType(
    [
        T.StructField("id_metodo_pago", T.LongType(), False),
        T.StructField("metodo_pago", T.StringType(), True),
    ]
)

OLAP_DIM_ENVIO = T.StructType(
    [
        T.StructField("id_envio", T.LongType(), False),
        T.StructField("estado_envio", T.StringType(), True),
        T.StructField("metodo_envio", T.StringType(), True),
    ]
)

OLAP_HECHO_VENTAS = T.StructType(
    [
        T.StructField("id_tiempo", T.LongType(), True),
        T.StructField("id_cliente", T.LongType(), True),
        T.StructField("id_producto", T.LongType(), True),
        T.StructField("id_categoria", T.LongType(), True),
        T.StructField("id_metodo_pago", T.LongType(), True),
        T.StructField("id_envio", T.LongType(), True),
        T.StructField("cantidad", T.DoubleType(), True),
        T.StructField("total_venta", T.DoubleType(), True),
        T.StructField("costo_envio", T.DoubleType(), True),
        T.StructField("margen", T.DoubleType(), True),
    ]
)

# 6-column fact grain (ref :181)
FACT_GRAIN = [
    "id_tiempo",
    "id_cliente",
    "id_producto",
    "id_categoria",
    "id_metodo_pago",
    "id_envio",
]

# ---------------------------------------------------------------------------
# Driver fixture shapes (FIXTURES.md §C) — read from parquet; listed here for
# validation and for streaming readers that need an explicit schema.
# ---------------------------------------------------------------------------

FIXTURE_REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

FIXTURE_NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

FIXTURE_CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

FIXTURE_SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

FIXTURE_PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

FIXTURE_ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

FIXTURE_LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

FIXTURE_EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

FIXTURE_DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

FIXTURE_EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

FIXTURE_TABLES = {
    "region": FIXTURE_REGION,
    "nation": FIXTURE_NATION,
    "customer": FIXTURE_CUSTOMER,
    "supplier": FIXTURE_SUPPLIER,
    "part": FIXTURE_PART,
    "orders": FIXTURE_ORDERS,
    "lineitem": FIXTURE_LINEITEM,
    "events": FIXTURE_EVENTS,
    "documents": FIXTURE_DOCUMENTS,
    "embeddings": FIXTURE_EMBEDDINGS,
}

# CDC event-feed contract (ref worker_sync.py:43-45, :87-93 — channel
# "<tabla>_sync", payload "<operation>:<record_id>").  One row per change
# event; the streaming source and the batch decoder share this shape.
CDC_EVENT = T.StructType(
    [
        T.StructField("channel", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
