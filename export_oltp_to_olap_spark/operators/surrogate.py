"""Deterministic surrogate keys.

The reference mints surrogate ids with Postgres sequences and stitches
them into facts via ``RETURNING`` (ref ``sync_oltp_to_olap.py:118``,
``:155``, ``:169``).  Sequences are stateful and racy (the reference has
explicit unique-violation recovery, ref ``:124-140``); the engine computes
keys deterministically instead (SURVEY.md §4.3.2):

* ``dense_rank`` mode — compact 1..N ids ordered by the natural key.
  Needs a global sort of the *distinct key set* only (dims are small by
  definition); ids shift when new members sort before existing ones, so
  use only where compactness matters more than stability.
* ``xxhash64`` mode — stateless, stable under inserts, shuffle-free,
  collision-checked at build time in tests. The scale default: at 100 TB
  no global ordering exists to rank against.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_surrogate_key(
    df: DataFrame,
    natural_keys: Sequence[str],
    key_col: str,
    mode: str = "dense_rank",
) -> DataFrame:
    """Append surrogate column ``key_col`` derived from ``natural_keys``.

    ``mode="dense_rank"``: 1..N by natural-key sort order (deterministic
    across runs for a fixed member set; matches what a fresh Postgres
    sequence would assign if members were inserted in sorted order).
    ``mode="xxhash64"``: stable 64-bit hash of the natural key.
    """
    cols = [F.col(k) for k in natural_keys]
    if mode == "dense_rank":
        # Single-partition window is intentional: only ever applied to
        # dimension tables (distinct value sets), never facts.
        w = Window.orderBy(*cols)
        return df.withColumn(key_col, F.dense_rank().over(w).cast("long"))
    if mode == "xxhash64":
        return df.withColumn(key_col, F.xxhash64(*cols))
    raise ValueError(f"unknown surrogate mode: {mode}")
