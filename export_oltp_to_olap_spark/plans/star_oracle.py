"""DuckDB oracle SQL for the star-ETL builders.

Each string is the ANSI-SQL re-statement of the corresponding Spark plan
in ``plans/dims.py`` / ``plans/fact.py``, over the same fixture-derived
OLTP tables (``fixtures_adapter.OLTP_CTE_SQL``).  Null orderings are
always explicit because Spark's defaults (ASC → NULLS FIRST, DESC →
NULLS LAST) differ from DuckDB's (NULLS LAST everywhere).
"""

from __future__ import annotations

from export_oltp_to_olap_spark.plans.fixtures_adapter import OLTP_CTE_SQL

# Shared CTEs -----------------------------------------------------------------

_DIM_TIEMPO_CTE = """
fechas AS (
  SELECT DISTINCT CAST(fecha_venta AS DATE) AS fecha
  FROM oltp_ventas WHERE fecha_venta IS NOT NULL
),
dim_tiempo AS (
  SELECT dense_rank() OVER (ORDER BY fecha) AS id_tiempo,
         fecha,
         CAST(year(fecha) AS INTEGER) AS anio,
         CAST(month(fecha) AS INTEGER) AS mes,
         CAST(day(fecha) AS INTEGER) AS dia,
         CAST(quarter(fecha) AS INTEGER) AS trimestre,
         CAST(weekofyear(fecha) AS INTEGER) AS semana
  FROM fechas
)
""".strip()

_DIM_METODO_PAGO_CTE = """
dim_metodo_pago AS (
  SELECT dense_rank() OVER (ORDER BY metodo_pago) AS id_metodo_pago,
         metodo_pago
  FROM (SELECT DISTINCT metodo_pago FROM oltp_ventas WHERE metodo_pago IS NOT NULL)
)
""".strip()

_DIM_ENVIO_CTE = """
dim_envio AS (
  SELECT dense_rank() OVER (ORDER BY estado_envio, metodo_envio) AS id_envio,
         estado_envio, metodo_envio
  FROM (SELECT DISTINCT estado_envio, metodo_envio FROM oltp_orden
        WHERE estado_envio IS NOT NULL AND metodo_envio IS NOT NULL)
)
""".strip()

_FACT_SOURCE_CTE = """
fact_src AS (
  SELECT v.id_venta, op.id_op, v.fecha_venta, o.id_cliente, op.id_producto,
         p.id_categoria, v.metodo_pago, o.estado_envio, o.metodo_envio,
         op.cantidad, op.precio_unitario, p.precio, p.costo, o.costo_envio
  FROM oltp_ventas v
  JOIN oltp_orden o ON v.id_orden = o.id_orden
  JOIN oltp_orden_producto op ON v.id_orden = op.id_orden
  JOIN oltp_productos p ON op.id_producto = p.id_producto
)
""".strip()

# Dimension oracles -----------------------------------------------------------

DIM_CLIENTE_SQL = f"""
WITH {OLTP_CTE_SQL},
{_FACT_SOURCE_CTE},
joined AS (
  SELECT c.id_cliente, c.nombre, c.apellido, c.edad, c.email, c.telefono,
         c.direccion, o.id_orden, o.ciudad_envio, o.pais_envio
  FROM oltp_clientes c
  LEFT JOIN oltp_orden o ON c.id_cliente = o.id_cliente
),
dedup AS (
  SELECT *, row_number() OVER (
      PARTITION BY id_cliente ORDER BY id_orden DESC NULLS LAST) AS rn
  FROM joined
),
base AS (
  SELECT id_cliente, nombre, apellido, edad, email, telefono, direccion,
         ciudad_envio AS ciudad, pais_envio AS pais
  FROM dedup WHERE rn = 1
)
SELECT * FROM base
UNION ALL
SELECT k.id_cliente, NULL, NULL, CAST(NULL AS INTEGER), NULL, NULL, NULL, NULL, NULL
FROM (SELECT DISTINCT id_cliente FROM fact_src WHERE id_cliente IS NOT NULL) k
WHERE k.id_cliente NOT IN (SELECT id_cliente FROM base)
"""

DIM_CATEGORIA_SQL = f"""
WITH {OLTP_CTE_SQL},
{_FACT_SOURCE_CTE},
base AS (
  SELECT id_categoria, nombre_categoria, descripcion
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY id_categoria ORDER BY nombre_categoria ASC NULLS FIRST) AS rn
    FROM oltp_categoria
  ) WHERE rn = 1
)
SELECT * FROM base
UNION ALL
SELECT k.id_categoria, NULL, NULL
FROM (SELECT DISTINCT id_categoria FROM fact_src WHERE id_categoria IS NOT NULL) k
WHERE k.id_categoria NOT IN (SELECT id_categoria FROM base)
"""

DIM_PRODUCTO_SQL = f"""
WITH {OLTP_CTE_SQL},
{_FACT_SOURCE_CTE},
base AS (
  SELECT id_producto, nombre_producto, descripcion, precio, costo, id_categoria
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY id_producto ORDER BY nombre_producto ASC NULLS FIRST) AS rn
    FROM oltp_productos
  ) WHERE rn = 1
)
SELECT * FROM base
UNION ALL
SELECT k.id_producto, NULL, NULL, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS BIGINT)
FROM (SELECT DISTINCT id_producto FROM fact_src WHERE id_producto IS NOT NULL) k
WHERE k.id_producto NOT IN (SELECT id_producto FROM base)
"""

DIM_TIEMPO_SQL = f"""
WITH {OLTP_CTE_SQL},
{_DIM_TIEMPO_CTE}
SELECT id_tiempo, fecha, anio, mes, dia, trimestre, semana FROM dim_tiempo
"""

DIM_METODO_PAGO_SQL = f"""
WITH {OLTP_CTE_SQL},
{_DIM_METODO_PAGO_CTE}
SELECT id_metodo_pago, metodo_pago FROM dim_metodo_pago
"""

DIM_ENVIO_SQL = f"""
WITH {OLTP_CTE_SQL},
{_DIM_ENVIO_CTE}
SELECT id_envio, estado_envio, metodo_envio FROM dim_envio
"""

# Fact oracle -----------------------------------------------------------------

# Shared tail: surrogate resolution (J5) + null guard (B5) + grain dedup
# (J1/D3).  Expects CTEs fact_src / dim_tiempo / dim_metodo_pago /
# dim_envio in scope — full or slice-restricted versions alike.
_HECHO_RESOLVE_TAIL = """
resolved AS (
  SELECT t.id_tiempo, s.id_cliente, s.id_producto, s.id_categoria,
         mp.id_metodo_pago, e.id_envio,
         s.cantidad,
         s.cantidad * s.precio_unitario AS total_venta,
         s.costo_envio,
         (s.precio_unitario - s.costo) * s.cantidad AS margen,
         s.id_venta, s.id_op
  FROM (SELECT *, CAST(fecha_venta AS DATE) AS fecha FROM fact_src) s
  LEFT JOIN dim_tiempo t ON s.fecha = t.fecha
  LEFT JOIN dim_metodo_pago mp ON s.metodo_pago = mp.metodo_pago
  LEFT JOIN dim_envio e ON s.estado_envio = e.estado_envio
                        AND s.metodo_envio = e.metodo_envio
),
guarded AS (
  SELECT * FROM resolved
  WHERE id_tiempo IS NOT NULL AND id_cliente IS NOT NULL
    AND id_producto IS NOT NULL AND id_categoria IS NOT NULL
    AND id_metodo_pago IS NOT NULL AND id_envio IS NOT NULL
),
dedup AS (
  SELECT *, row_number() OVER (
      PARTITION BY id_tiempo, id_cliente, id_producto, id_categoria,
                   id_metodo_pago, id_envio
      ORDER BY id_venta DESC, id_op DESC) AS rn
  FROM guarded
)
SELECT id_tiempo, id_cliente, id_producto, id_categoria, id_metodo_pago,
       id_envio, cantidad, total_venta, costo_envio, margen
FROM dedup WHERE rn = 1
""".strip()

HECHO_VENTAS_SQL = f"""
WITH {OLTP_CTE_SQL},
{_DIM_TIEMPO_CTE},
{_DIM_METODO_PAGO_CTE},
{_DIM_ENVIO_CTE},
{_FACT_SOURCE_CTE},
{_HECHO_RESOLVE_TAIL}
"""


def incremental_hecho_sql(orden_id: int) -> str:
    """Oracle for the §3.2 incremental path: the hecho slice one changed
    order produces.  Mirrors ``filter_oltp_for_keys(oltp, "orden", [id])``
    + ``build_star`` exactly: ventas restricted to the order, productos
    semi-joined to the order's lines, slice dims with slice-relative
    dense_rank surrogate keys, dim_envio from the unrestricted orden."""
    return f"""
WITH {OLTP_CTE_SQL},
ventas_r AS (SELECT * FROM oltp_ventas WHERE id_orden = {orden_id}),
productos_r AS (
  SELECT * FROM oltp_productos WHERE id_producto IN (
    SELECT DISTINCT id_producto FROM oltp_orden_producto
    WHERE id_orden = {orden_id} AND id_producto IS NOT NULL)
),
fechas AS (
  SELECT DISTINCT CAST(fecha_venta AS DATE) AS fecha
  FROM ventas_r WHERE fecha_venta IS NOT NULL
),
dim_tiempo AS (
  SELECT dense_rank() OVER (ORDER BY fecha) AS id_tiempo, fecha FROM fechas
),
dim_metodo_pago AS (
  SELECT dense_rank() OVER (ORDER BY metodo_pago) AS id_metodo_pago,
         metodo_pago
  FROM (SELECT DISTINCT metodo_pago FROM ventas_r WHERE metodo_pago IS NOT NULL)
),
{_DIM_ENVIO_CTE},
fact_src AS (
  SELECT v.id_venta, op.id_op, v.fecha_venta, o.id_cliente, op.id_producto,
         p.id_categoria, v.metodo_pago, o.estado_envio, o.metodo_envio,
         op.cantidad, op.precio_unitario, p.precio, p.costo, o.costo_envio
  FROM ventas_r v
  JOIN oltp_orden o ON v.id_orden = o.id_orden
  JOIN oltp_orden_producto op ON v.id_orden = op.id_orden
  JOIN productos_r p ON op.id_producto = p.id_producto
),
{_HECHO_RESOLVE_TAIL}
"""


# Fact-source join (J3/B2) as its own checkable operator ----------------------

FACT_SOURCE_SQL = f"""
WITH {OLTP_CTE_SQL},
{_FACT_SOURCE_CTE}
SELECT * FROM fact_src
"""
