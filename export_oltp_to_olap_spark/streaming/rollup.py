"""Continuous time-bucket rollup — incrementally maintained aggregates.

The hypertable/continuous-aggregate pattern: a persisted hourly rollup
of the event stream that new micro-batches UPDATE by merging partial
aggregates, instead of recomputing history.  The reference recomputes
from source on every change (SURVEY.md §2.I3); that stops being viable
when history is 100 TB and a batch touches one hour of it.

Correct-by-algebra maintenance:

* Rollup state holds only ALGEBRAIC accumulators (count, exact integer
  cent sum, min, max) — every one merges associatively and
  commutatively, so ``merge(rollup(A), rollup(B)) == rollup(A ∪ B)``
  for ANY split of the stream into batches, in any order.  Averages and
  rates are derived at read time, never stored.
* Money accumulates in integer cents (``round(value·100)`` per event):
  double sums drift with accumulation order, which would make the
  incremental path diverge from a full recompute by ulps — integers
  make convergence EXACT (asserted in tests).
* The merge itself is a keyed group-by over (old state ∪ new partials)
  — one shuffle proportional to touched buckets + state size; with the
  state table partitioned by bucket date, writes touch only affected
  partitions (dynamic partition overwrite at scale).
* Exactly-once per batch comes from the streaming checkpoint
  (foreachBatch); replaying a batch would double-count — the same
  contract every counter-merge system has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_KEYS = ("bucket_start", "event_type")


def rollup_partials(events: DataFrame, bucket: str = "1 hour") -> DataFrame:
    """Aggregate raw events to per-bucket algebraic accumulators."""
    return (
        events.groupBy(
            F.window("ts", bucket)["start"].alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def merge_rollup(state: DataFrame, partials: DataFrame) -> DataFrame:
    """Fold a batch of partial aggregates into the rollup state.

    Pure algebraic merge — associative and commutative, so any batch
    slicing of the stream converges to the full recompute exactly.
    """
    combined = state.unionByName(partials)
    return combined.groupBy(*ROLLUP_KEYS).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_cents").alias("total_cents"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def rollup_report(state: DataFrame) -> DataFrame:
    """Read-time derivation of non-algebraic measures (avg) from the
    stored accumulators."""
    return state.select(
        *ROLLUP_KEYS,
        "n_events",
        (F.col("total_cents") / 100.0).alias("total_value"),
        (F.col("total_cents") / F.col("n_events") / 100.0).alias("avg_value"),
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# Distinct-count rollup: HLL sketch accumulators
# ---------------------------------------------------------------------------
#
# COUNT(DISTINCT user) is the one aggregate the algebraic rollup above
# cannot maintain: distinctness is not algebraic over raw counts, and
# keeping exact per-bucket user sets makes state ∝ cardinality.  The
# mergeable form every production rollup uses is an HLL sketch column:
# Datasketches HLL registers union losslessly for a fixed lgK, so
#
#     hll_union(sketch(A), sketch(B)) == sketch(A ∪ B)     (bit-exact)
#
# — the same any-slicing convergence contract as the integer-cent sums,
# asserted in tests.  State per (bucket, type) is one fixed-size binary
# (~2.5 KB at lgK=12, ±~1.6% error), regardless of cardinality.

HLL_LGK = 12


def distinct_rollup_partials(
    events: DataFrame, key_col: str = "user_id", bucket: str = "1 hour"
) -> DataFrame:
    """Per-bucket HLL sketches of ``key_col`` — the map-side partial."""
    return (
        events.groupBy(
            F.window("ts", bucket)["start"].alias("bucket_start"),
            "event_type",
        )
        .agg(F.hll_sketch_agg(key_col, F.lit(HLL_LGK)).alias("user_sketch"))
    )


def merge_distinct_rollup(state: DataFrame, partials: DataFrame) -> DataFrame:
    """Union sketch state with a batch's partials — associative and
    commutative like every other accumulator in this module."""
    combined = state.unionByName(partials)
    return combined.groupBy(*ROLLUP_KEYS).agg(
        F.hll_union_agg("user_sketch", F.lit(False)).alias("user_sketch")
    )


def distinct_rollup_report(state: DataFrame) -> DataFrame:
    """Read-time estimates from the stored sketches."""
    return state.select(
        *ROLLUP_KEYS,
        F.hll_sketch_estimate("user_sketch").alias("approx_distinct_users"),
    )
