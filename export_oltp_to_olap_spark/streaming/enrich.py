"""Stream-static enrichment: dimension lookup at ingest time.

The reference enriches row-at-a-time with a correlated OLTP SELECT per
event (`sync_oltp_to_olap.py:377-401`, the `orden→cliente` probe); the
engine's batch twin is the broadcast natural-key join in the star
build.  This module is the same lookup applied to a STREAM: every
micro-batch of events joins against a dimension table that lives as a
plain parquet/warehouse table and may be rewritten between batches.

Two lookup shapes:

* ``enrich_stream`` — current-state lookup.  LEFT join so unmatched
  events survive with NULL dims plus an ``enrich_matched`` flag (the
  streaming analogue of `operators/ri_repair.py`'s anti-join
  placeholders: never silently drop a fact).

* ``enrich_stream_scd2`` — POINT-IN-TIME lookup against an SCD2
  version table (`operators/scd.py` conventions: ``valid_from`` /
  ``valid_to`` half-open, NULL ``valid_to`` = current).  Each event
  joins the version whose validity interval covers the event's own
  sequence value — late events enrich against the dimension AS IT WAS,
  which a current-state (LWW) dimension cannot do at all.  This is the
  payoff of keeping SCD2 history.

Scale / semantics notes (100 TB/day):

* The static side sits under ``F.broadcast`` — per-batch map-side hash
  join, the stream never shuffles for the lookup.  Remove the hint for
  dimensions too large to broadcast and Spark plans a per-batch
  shuffle join instead (correct, slower).
* Stream-static joins are STATELESS: no watermark, no join state, and
  Spark re-plans the static side each micro-batch, so a dimension
  rewrite (the CDC maintainer in `streaming/cdc.py`, or the SCD2
  delta-merge) is visible to the NEXT batch — eventual-consistency
  enrichment, exactly like the reference's per-event OLTP probe reads
  whatever is committed at probe time.
* At-most-one match must hold on the static side (PK on the key for
  current-state; non-overlapping versions for SCD2 — both are invariants
  their builders already test).  The join can then never fan events out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str,
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """LEFT-join ``events`` (streaming) to ``dim`` (static, keyed by
    ``key``) — unmatched events keep NULL dim columns and
    ``enrich_matched = false``."""
    cols = dim_cols if dim_cols is not None else [c for c in dim.columns if c != key]
    slim = dim.select(key, *cols, F.lit(True).alias("enrich_matched"))
    out = events.join(F.broadcast(slim), key, "left")
    return out.withColumn("enrich_matched", F.coalesce("enrich_matched", F.lit(False)))


def enrich_stream_scd2(
    events: DataFrame,
    versions: DataFrame,
    key: str,
    seq_col: str,
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Point-in-time LEFT join of streaming ``events`` against an SCD2
    version table: the matching version satisfies
    ``valid_from <= seq < coalesce(valid_to, +inf)``.

    ``seq_col`` is the event's position on the SAME sequence axis the
    versions were built over (`scd.py` uses the change-event sequence).
    Version intervals partition that axis per key, so at most one
    version matches any event.
    """
    cols = (
        dim_cols
        if dim_cols is not None
        else [
            c
            for c in versions.columns
            if c not in {key, "version_seq", "valid_from", "valid_to", "is_current"}
        ]
    )
    v = versions.select(
        F.col(key).alias("__vk"),
        "valid_from",
        "valid_to",
        *cols,
        F.lit(True).alias("enrich_matched"),
    )
    cond = (
        (events[key] == v["__vk"])
        & (events[seq_col] >= v["valid_from"])
        & (v["valid_to"].isNull() | (events[seq_col] < v["valid_to"]))
    )
    out = events.join(F.broadcast(v), cond, "left").drop("__vk", "valid_from", "valid_to")
    return out.withColumn("enrich_matched", F.coalesce("enrich_matched", F.lit(False)))
