"""Watermarked event-time windows over a streaming event feed.

The reference has no event-time semantics — late NOTIFY events simply
trigger another idempotent re-sync (SURVEY.md §2.I3).  For the analytic
surface, Structured Streaming's watermark + window operators handle late
data with bounded state:

* ``withWatermark(ts, delay)`` — the engine tracks ``max(ts) - delay``;
  windows older than the watermark are finalized (emitted once in append
  mode) and their state dropped, so state size is bounded by the delay,
  not the stream length.
* Late events within the delay are incorporated before the window
  finalizes; events later than the watermark are dropped — the documented
  trade against unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling — or, with ``slide``, hopping — event-time counts with
    late-data tolerance = watermark.

    Append-mode output: one final row per (window, event_type) once the
    watermark passes the window end.  With a slide each event feeds
    window/slide overlapping windows (state ∝ open windows × types, the
    same bound scaled by the overlap factor).  Batch twins
    (oracle-checked): ``plans.events.tumbling_hourly_stats`` /
    ``hopping_halfhour_stats``.
    """
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Data-driven session windows per user: a session extends while
    events arrive within ``gap`` of the previous one and closes after a
    silence of ``gap``.

    ``session_window`` keeps per-key open-session state; the watermark
    closes sessions whose end is older than ``max(ts) - watermark`` and
    drops their state, so state is bounded by (active keys × open
    sessions), not stream length.  The batch twin (oracle-checked,
    same gap semantics via lag + cumulative-sum) is
    ``plans.events.sessionize``.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_events_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once event delivery from an at-least-once feed:
    ``dropDuplicatesWithinWatermark`` keeps each key's first arrival and
    drops replays until the watermark passes it.

    This is the bounded-state form of stream dedup: the engine retains a
    key's dedup state only while a duplicate could still legally arrive
    (ts newer than ``max(ts) − watermark``), so state size tracks the
    delay window, not the stream length — the right primitive for
    at-least-once sources (Kafka redeliveries, NOTIFY replays) where
    duplicates cluster near real time.  Contrast
    ``stateful.streaming_exact_dedup``, which deduplicates FOREVER at the
    cost of a growing seen-set.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
