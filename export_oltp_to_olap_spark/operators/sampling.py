"""Deterministic sampling and dataset splits — training-data plumbing.

A training corpus needs reproducible subsets: eval holdouts, train/val/
test splits, downsampling a 100 TB pool to a target budget.  RNG-based
``df.sample()`` is seed-and-partitioning dependent (resplitting after a
repartition reassigns rows — leakage); hashing the stable row key is
the standard fix: membership is a pure function of the key, so splits
are stable across runs, engines, partitionings, and incremental
appends.  md5 keeps it engine-portable (DuckDB restates it exactly),
and at 64k hash buckets the per-split fractions land within ~1/65536 of
the request.

Scale: a pure map-side projection/filter — no shuffle, no state, safe
to push under any downstream plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 65536  # 4 md5 hex chars


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 65536) from the row key + salt.

    Salting decorrelates different splits/samples taken over the same
    key space (an unsalted 10% sample would always be a subset of the
    unsalted 20% one).
    """
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 4),
        16,
        10,
    ).cast("int")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen purely by hash of ``key_col``."""
    return df.where(_hash_bucket(F.col(key_col), salt) < int(fraction * _BUCKETS))


def assign_splits(
    df: DataFrame,
    key_col: str,
    fractions: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "split",
) -> DataFrame:
    """Append a ``split`` column partitioning rows by hash range.

    Ranges are cumulative over ``fractions`` (rounded to hash buckets);
    every row lands in exactly one split, the last split absorbs the
    rounding tail, and membership never changes when new rows arrive.
    """
    bucket = _hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    for i, (name, frac) in enumerate(fractions):
        acc += frac
        bound = _BUCKETS if i == len(fractions) - 1 else int(acc * _BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def split_summary(documents: DataFrame) -> DataFrame:
    """Per-split row counts and token volume over the documents table —
    the sanity report run after any (re)split of a training corpus."""
    from export_oltp_to_olap_spark.functions.text import tokens

    assigned = assign_splits(documents, "doc_id")
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens("text"))).alias("n_tokens"),
        )
        .orderBy("split")
    )


SPLIT_SUMMARY_SQL = f"""
WITH assigned AS (
  SELECT doc_id, text,
         CASE
           WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                < {int(0.8 * _BUCKETS)} THEN 'train'
           WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                < {int(0.9 * _BUCKETS)} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT split,
       count(*) AS n_docs,
       CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                x -> x <> ''))) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY split
ORDER BY split
"""
