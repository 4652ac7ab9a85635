"""Custom stateful streaming operator: ``applyInPandasWithState``.

The reference keeps NO stream-side state (every event re-reads OLTP and
upserts — SURVEY.md §2.I6).  This module shows the engine's surface for
operators that genuinely need cross-batch state, the pattern a
training-data pipeline uses for running per-key accumulators, dedup-seen
sets, or rate trackers:

* state lives in Spark's checkpointed state store, keyed by the group —
  executor-partitioned, recovered on restart, no driver bottleneck;
* each micro-batch hands the operator Arrow-batched pandas frames for
  the key plus its ``GroupState``; the operator updates state and emits
  output rows (update output mode).

Accumulation uses integer cents (``round(value*100)`` per event) so
totals are exact and batch-split-independent — summing doubles across
restarts would drift by accumulation order.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n_events long, total_cents long"


def cents_half_up(values) -> int:
    """Sum of per-value integer cents, rounding ties HALF_UP (away from
    zero) — the same mode as Spark's ``F.round`` in the batch rollup
    (streaming/rollup.py), so streaming and batch accumulators agree on
    exact half-cents.  numpy/pandas ``.round()`` is half-to-even and
    disagrees (e.g. 0.125 → 12 cents instead of 13)."""
    import numpy as np

    cents = np.asarray(values, dtype=np.float64) * 100.0
    half_up = np.copysign(np.floor(np.abs(cents) + 0.5), cents)
    return int(half_up.astype("int64").sum())


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n_events, total_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_events += len(pdf)
        total_cents += cents_half_up(pdf["value"].to_numpy())
    state.update((n_events, total_cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n_events], "total_cents": [total_cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (n_events, total_cents) per user across micro-batches.

    Works on a streaming DataFrame with ``user_id``/``value`` columns;
    emits one updated row per user per batch that saw that user.
    """
    from export_oltp_to_olap_spark import shipping

    shipping.ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming exact dedup (stateful seen-set)
# ---------------------------------------------------------------------------

DEDUP_OUTPUT_SCHEMA = "doc_id long, fp string"
DEDUP_STATE_SCHEMA = "seen array<string>"


def _make_dedup_seen(max_state: int | None = None):
    def _dedup_seen(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # State is the seen-list in FIRST-SEEN order (not sorted): FIFO
        # eviction needs to know which fingerprints are oldest.
        seen_list = list(state.get[0]) if state.exists else []
        seen = set(seen_list)
        out_ids, out_fps = [], []
        for pdf in pdfs:
            # In-batch dedup first (keep min doc_id per fingerprint) so a
            # batch carrying two copies emits exactly one.
            pdf = pdf.sort_values("doc_id").drop_duplicates("fp", keep="first")
            fresh = pdf[~pdf["fp"].isin(seen)]
            out_ids.extend(int(i) for i in fresh["doc_id"])
            out_fps.extend(fresh["fp"])
            for fp in fresh["fp"]:
                seen.add(fp)
                seen_list.append(fp)
        if max_state is not None and len(seen_list) > max_state:
            seen_list = seen_list[-max_state:]  # FIFO: evict the oldest
        state.update((seen_list,))
        yield pd.DataFrame({"doc_id": out_ids, "fp": out_fps})

    return _dedup_seen


def streaming_exact_dedup(docs: DataFrame, max_state_per_bucket: int | None = None) -> DataFrame:
    """First-seen-wins exact dedup over a document STREAM: emit each
    distinct text the first time it arrives, drop every later copy —
    within a batch and across batches/restarts (state is checkpointed).

    Input needs ``doc_id`` and ``fp`` (content fingerprint, e.g.
    ``md5(text)``) columns; grouping on a 2-hex-char fingerprint prefix
    spreads the seen-set over 256 state keys so no single group holds the
    whole corpus — at real scale the prefix widens (4 chars → 65k groups)
    and the state store (RocksDB-backed on a cluster) shards them across
    executors.

    State growth: exact forever-dedup fundamentally keeps every distinct
    fingerprint somewhere, so unset ``max_state_per_bucket`` means state
    grows with distinct-document count.  Setting it bounds each bucket's
    seen-set by FIFO eviction — a sliding retention window over the last
    N distinct fingerprints per bucket.  The trade, explicitly:
    first-seen-wins still holds for any duplicate arriving while its
    original is retained; a copy arriving AFTER its fingerprint was
    evicted is re-emitted (recall loss on re-dedup, never a false drop).
    The time-bounded alternative is
    ``streaming/windows.py::dedup_events_within_watermark``.

    Batch analog: ``operators/neardup.py::exact_dedup_docs``.
    """
    from pyspark.sql import functions as F

    from export_oltp_to_olap_spark import shipping

    shipping.ensure_shipped(docs.sparkSession)
    keyed = docs.withColumn("bucket", F.substring("fp", 1, 2))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_dedup_seen(max_state_per_bucket),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
