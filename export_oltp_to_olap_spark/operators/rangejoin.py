"""Range (interval) join — bucketed, never quadratic.

No analog in the reference (equi-joins only — SURVEY.md §2.C); this is
the time-window companion to the as-of join (`operators/asof.py`): "all
right rows whose timestamp falls in [left.ts + lower, left.ts + upper)
per key" — sliding-window feature counts, exposure windows, sensor
alignment.

Scale design: a naive ``l.key = r.key AND r.ts BETWEEN …`` theta-join
degenerates to per-key cross products (Spark can only equi-hash the key
part; every same-key pair is materialized before the range filter).
Instead both sides bucket time into fixed windows the width of the
interval span, so a left row overlaps at most 2 buckets:

* right rows land in bucket ``floor(ts / span)`` — one row each;
* each left row explodes to the (≤2) buckets its window touches;
* the equi-join on ``(key, bucket)`` materializes only same-bucket
  pairs — candidates ∝ true matches + boundary spill, never key².
* the exact interval filter (in microseconds — integer-exact in both
  engines) restores precision.

Skewed keys shuffle by ``(key, bucket)``, so a hot key's load spreads
across its time range instead of landing on one reducer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    lower_us: int,
    upper_us: int,
    right_cols: Sequence[str],
    prefix: str = "r_",
) -> DataFrame:
    """Inner interval join: each ``left`` row paired with every ``right``
    row sharing ``on`` keys with ``right.ts in [left.ts + lower_us,
    left.ts + upper_us)`` (microsecond precision, lower inclusive,
    upper exclusive).  ``right_cols`` return prefixed.
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    span = upper_us - lower_us
    on = list(on)

    def fdiv(col, n: int):
        # exact floored long division (F.floor over a double quotient can
        # mis-bucket at boundaries once micros exceed 2^53 / span)
        return ((col - F.pmod(col, F.lit(n))) / F.lit(n)).cast("long")

    lt = left.withColumn("_lus", F.unix_micros(F.col(ts_col)))
    rt = right.select(
        *on,
        F.unix_micros(F.col(ts_col)).alias("_rus"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    ).withColumn("_bucket", fdiv(F.col("_rus"), span))

    lo = F.col("_lus") + F.lit(lower_us)
    hi = F.col("_lus") + F.lit(upper_us)
    exploded = lt.withColumn(
        "_bucket",
        F.explode(F.sequence(fdiv(lo, span), fdiv(hi - F.lit(1), span))),
    )
    return (
        exploded.join(rt, on=[*on, "_bucket"])
        .where((F.col("_rus") >= lo) & (F.col("_rus") < hi))
        .drop("_bucket", "_lus", "_rus")
    )


def clicks_before_purchase(events: DataFrame, window_sec: int = 3600) -> DataFrame:
    """Per purchase: how many clicks the user made in the preceding
    ``window_sec`` seconds (exclusive of the purchase instant).  Keeps
    zero-click purchases via a count-then-left-join — the interval join
    itself stays inner/bucketed."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    pairs = interval_join(
        purchases,
        clicks,
        on=["user_id"],
        ts_col="ts",
        lower_us=-window_sec * 1_000_000,
        upper_us=0,
        right_cols=["click_id"],
    )
    counts = pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks_prev_hour")
    )
    return (
        purchases.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.coalesce("n_clicks_prev_hour", F.lit(0)).alias("n_clicks_prev_hour"),
        )
    )


CLICKS_BEFORE_PURCHASE_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       count(c.event_id) AS n_clicks_prev_hour
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
 AND epoch_us(c.ts) < epoch_us(p.ts)
GROUP BY 1, 2, 3
"""
