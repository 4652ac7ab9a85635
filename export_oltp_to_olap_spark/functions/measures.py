"""Derived fact measures (reference F8/F9).

``total_venta = cantidad * precio_unitario`` (ref sync_oltp_to_olap.py:317)
``margen = (precio_unitario - costo) * cantidad`` (ref :318)

Plain arithmetic Columns — codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def total_venta(cantidad: Column | str, precio_unitario: Column | str) -> Column:
    """Revenue measure (ref F8, :317)."""
    return _c(cantidad) * _c(precio_unitario)


def margen(precio_unitario: Column | str, costo: Column | str, cantidad: Column | str) -> Column:
    """Margin measure (ref F9, :318)."""
    return (_c(precio_unitario) - _c(costo)) * _c(cantidad)


def revenue(extendedprice: Column | str, discount: Column | str) -> Column:
    """TPC-H-style discounted revenue used by the fixture queries:
    ``l_extendedprice * (1 - l_discount)``."""
    return _c(extendedprice) * (F.lit(1.0) - _c(discount))
