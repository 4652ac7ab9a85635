"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting handles skewed JOINS automatically
(session.py), but a skewed GROUP BY key still funnels one key's rows into
one reducer.  For algebraic aggregates (sum/count/min/max — anything with
a partial form) the fix is salting: aggregate on (key, salt) first so the
hot key spreads over N reducers, then combine the N partials.

Spark already does map-side partial aggregation, which usually suffices;
salting matters when a single key's PARTIAL rows still overwhelm one
reducer (billions of rows per key at 100 TB, or high-cardinality
distinct-ish state per key).  The helper keeps the algebra explicit so
the two stages compose correctly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (first-stage fn, combine fn) per algebraic aggregate
_ALGEBRA = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str | Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with hot keys spread over ``n_salts`` reducers.

    ``aggs`` is a list of ``(fn, col, alias)`` with fn in
    sum/count/min/max.  Result is identical to
    ``df.groupBy(*keys).agg(...)`` — verified by tests — but the first
    shuffle hashes on (keys, salt), so no reducer sees more than ~1/n of
    any key.
    """
    unknown = [fn for fn, _, _ in aggs if fn not in _ALGEBRA]
    if unknown:
        raise ValueError(f"non-algebraic aggregates not saltable: {unknown}")

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRA[fn][0](F.col(c) if isinstance(c, str) else c).alias(f"__p_{alias}")
            for fn, c, alias in aggs
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[_ALGEBRA[fn][1](f"__p_{alias}").alias(alias) for fn, _, alias in aggs]
    )
