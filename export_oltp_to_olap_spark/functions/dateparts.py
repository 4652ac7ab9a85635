"""Date normalization and date-part derivation (reference F1-F7, F10).

The reference derives ``anio/mes/dia/trimestre/semana`` in Python per row
(ref ``sync_oltp_to_olap.py:108-112``) and tolerantly re-parses strings
with ``strptime(str(x), "%Y-%m-%d")`` (ref ``:263-265``).  Spark built-ins
match exactly:

* ``quarter`` implements the same ``(month-1)//3 + 1`` formula (ref :111)
* ``weekofyear`` is ISO-8601 week-of-year, matching Python's
  ``isocalendar()[1]`` (ref :112)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# OLAP dim_tiempo derived columns, in schema order (FIXTURES.md §B).
DATE_PART_COLUMNS = ("anio", "mes", "dia", "trimestre", "semana")


def to_fecha(col: Column | str) -> Column:
    """Normalize a timestamp/string to DATE (ref F1 ``fecha.date()`` at
    :97-98 and F7 string re-parse at :263-265 — ``to_date`` handles both)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c)


def date_parts(fecha: Column | str) -> dict[str, Column]:
    """All five derived date parts of the reference time dimension."""
    c = to_fecha(fecha)
    return {
        "anio": F.year(c),  # F2, ref :108
        "mes": F.month(c),  # F3, ref :109
        "dia": F.dayofmonth(c),  # F4, ref :110
        "trimestre": F.quarter(c),  # F5, ref :111 — identical formula
        "semana": F.weekofyear(c),  # F6, ref :112 — ISO-8601 in both
    }
