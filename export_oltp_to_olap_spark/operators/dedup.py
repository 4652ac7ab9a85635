"""Key-grained deduplication — the set-wise form of the reference's upserts.

The reference enforces one-row-per-key via Postgres
``INSERT ... ON CONFLICT (key) DO UPDATE`` executed per row, so within a
batch the *last* row processed wins, where "last" is Postgres scan order —
nondeterministic (ref ``sync_oltp_to_olap.py:56-93``, ``:150-191``;
SURVEY.md §7.4).  The engine makes this deterministic: an explicit
tiebreak ordering picks the winner.

Scale notes (100 TB): ``row_number`` over ``partitionBy(keys)`` is a
single hash-shuffle on the key — the same shuffle an aggregation would
pay, no global sort.  AQE skew-join/partition splitting handles hot keys.
For the common "latest by monotonically increasing version" case,
``max_by``-style aggregation (`latest_by_key_agg`) does it with partial
(map-side) aggregation and is preferred when only the winning row's
columns are needed — it avoids materializing per-row ranks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by``.

    To express last-write-wins, pass a descending version/tiebreak column
    (e.g. ``F.col("id_orden").desc()``): the reference's in-batch
    ON CONFLICT semantics (ref :59, :74, :86, :153, :167, :181) with a
    deterministic winner.
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_by_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    version: str,
) -> DataFrame:
    """Last-write-wins via ``max_by`` aggregation (map-side combinable).

    Equivalent to ``latest_by_key(df, keys, [F.col(version).desc(), ...])``
    when ``version`` is unique per key; cheaper at scale because partial
    aggregation collapses duplicates before the shuffle.
    """
    value_cols = [c for c in df.columns if c not in keys]
    aggs = [F.max_by(c, F.col(version)).alias(c) for c in value_cols]
    return df.groupBy(*keys).agg(*aggs).select(*df.columns)


def exact_dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal (north-star: exact dedup).

    ``dropDuplicates`` = hash-groupBy on the subset; partial aggregation
    collapses duplicates map-side before the shuffle, so the shuffle
    carries one row per distinct key per input partition — the right
    shape at 100 TB.
    """
    return df.dropDuplicates(list(subset) if subset else None)
