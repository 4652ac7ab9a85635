"""As-of (point-in-time) join — an operator Spark lacks natively.

No analog in the reference (its joins are all equi-joins —
SURVEY.md §2.C); this is analytic-surface breadth for the time-series /
feature-store pattern: "for each left row, the latest right row at or
before its timestamp, per key".  Training-data pipelines use it for
point-in-time-correct feature attachment (no leakage from the future).

Scale design — the union-tag plan, NOT a range join:

* A naive implementation joins on key + ``l.ts >= r.ts`` and keeps the
  max — a range join whose intermediate blows up as (left × right per
  key).  The union-tag plan instead interleaves both inputs in ONE
  shuffle on the key, sorts by (ts, side) within each key partition,
  and carries the most recent right row forward with a running
  ``last(..., ignoreNulls=True)`` window — cost O((L+R) log(L+R))
  per key, intermediate exactly L+R rows, one Exchange total.
* Right rows sort BEFORE left rows at an equal timestamp, so the match
  is inclusive (``right.ts <= left.ts``) — DuckDB ``ASOF JOIN``
  semantics, which the oracle restates natively.
* The carried right row travels as a single struct column, so the
  window state per row is one value regardless of how many right
  columns are attached.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every ``left`` row plus ``right_cols`` from the
    latest ``right`` row with the same ``on`` keys and ``right.ts_col <=
    left.ts_col`` (nulls when no such row exists).

    ``right_cols`` must not collide with left column names; they come
    back prefixed with ``prefix``.
    """
    on = list(on)
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    # A right row with NULL ts can never satisfy `right.ts <= left.ts`
    # (DuckDB ASOF: the comparison is never true for NULL), but under
    # `orderBy(ts.asc)` Spark sorts NULLs FIRST, so an unfiltered NULL-ts
    # row would be carried into every left row of its key.  Drop them
    # before the union.
    r = right.where(F.col(ts_col).isNotNull()).select(
        *on, F.col(ts_col).alias(ts_col), F.lit(0).alias("_side"), payload
    )
    l_cols = left.columns
    lt = left.select(
        "*", F.lit(1).alias("_side"), F.lit(None).cast(r.schema["_r"].dataType).alias("_r")
    )
    # Align schemas: right rows carry nulls for left-only columns.
    r_aligned = r.select(
        *[
            F.col(c) if c in (*on, ts_col) else F.lit(None).cast(lt.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        "_side",
        "_r",
    )
    unioned = lt.unionByName(r_aligned)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    return carried.where(F.col("_side") == 1).select(
        *l_cols,
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def purchases_asof_clicks(events: DataFrame) -> DataFrame:
    """Each purchase event joined to the user's latest prior (or
    simultaneous) click: attribution lag analysis.  Output one row per
    purchase with the matched click id/ts and the exact microsecond gap
    (null when the user never clicked before purchasing)."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(
        purchases, clicks, on=["user_id"], ts_col="ts", right_cols=["click_id", "ts"]
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("r_click_id").alias("click_id"),
        F.col("r_ts").alias("click_ts"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("micros_since_click"),
    )


PURCHASES_ASOF_CLICKS_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.event_id AS click_id,
       c.ts AS click_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS micros_since_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""
