"""Watermarked stream-stream joins: streaming click→purchase attribution.

The batch twin is `operators/rangejoin.py::clicks_before_purchase`
(oracle-checked): every (purchase, click) pair for the same user with
the click inside a lookback interval before the purchase.  This module
is the same semantics at ingest time, as a Structured Streaming
stream-stream INNER join — the reference's streaming surface is
row-at-a-time NOTIFY handling (SURVEY.md §2.I), so this is engine
surface the reference cannot express.

State-bound design (the part that matters at 100 TB/day):

* BOTH sides carry ``withWatermark``; the join condition carries an
  explicit event-time range (``click_ts BETWEEN purchase_ts - lookback
  AND purchase_ts``).  Spark derives from these how long each side's
  rows can possibly still match — clicks older than
  ``watermark + lookback`` and purchases older than ``watermark`` are
  evicted from the join state.  Without the time-range conjunct the
  state would grow with the stream; with it, state ≈ traffic inside one
  (watermark + lookback) window per user.
* The join keys on ``user_id`` first, so the stateful join shuffles both
  streams once on the same key and matches within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """All (purchase, click) attributions as both streams arrive.

    ``clicks`` / ``purchases`` are streaming DataFrames with at least
    (event_id, user_id, ts).  Output: one row per qualifying pair —
    identical to the batch range join over the same (non-late) rows,
    with the same interval convention (``purchase_ts - lookback ≤
    click_ts < purchase_ts``, upper-exclusive).  Inner join + watermarks
    on both sides ⇒ append mode, each pair emitted exactly once.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = p.join(
        c,
        on=[
            F.col("user_id") == F.col("click_user"),
            F.col("click_ts") < F.col("purchase_ts"),
            F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"),
        ],
        how="inner",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
            "micros_before_purchase"
        ),
    )
