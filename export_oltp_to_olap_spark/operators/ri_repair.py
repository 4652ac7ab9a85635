"""Referential-integrity repair: placeholder rows for missing dimensions.

The reference checks each fact row's dimension FKs with per-row point
SELECTs and inserts a null-filled placeholder when the dimension member is
missing (ref ``sync_oltp_to_olap.py:272-314`` — categoria :274-284,
cliente :286-297, producto :299-310).  That is an O(fact_rows) nested-loop
semi-join; the set-wise form is one left-anti join per dimension
(SURVEY.md §2.J4):

    missing = facts.select(k).distinct() ANTI JOIN dim ON k
    dim'    = dim UNION ALL null-filled placeholder rows for missing

Scale: ``distinct()`` collapses fact keys map-side; the anti-join is
against the (small) dimension, which AQE broadcasts — no O(facts) shuffle
of the wide fact rows, only of the distinct key column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_dim_keys(facts: DataFrame, dim: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Distinct fact FK tuples with no matching dimension member (J4)."""
    non_null = F.lit(True)
    for k in keys:
        non_null = non_null & F.col(k).isNotNull()
    fact_keys = facts.select(*keys).where(non_null).distinct()
    return fact_keys.join(dim.select(*keys), on=list(keys), how="left_anti")


def repair_missing_dims(
    facts: DataFrame, dim: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Return ``dim`` extended with null-filled placeholders so every fact
    FK resolves (the reference's placeholder inserts, ref :272-314).

    Placeholder rows carry the key columns and NULL for every other
    column, exactly like the reference's ``INSERT (id, NULL, NULL, ...)``.
    """
    missing = missing_dim_keys(facts, dim, keys)
    placeholders = missing.select(
        *[F.col(k) for k in keys],
        *[
            F.lit(None).cast(dict(dim.dtypes)[c]).alias(c)
            for c in dim.columns
            if c not in keys
        ],
    ).select(*dim.columns)
    return dim.unionByName(placeholders)
