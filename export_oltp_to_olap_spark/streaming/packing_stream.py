"""Streaming sequence packing: assign docs to training bins at INGEST.

The batch packer (`operators/chunking.pack_assignments`) lays documents
end-to-end per (source, shard) with a prefix-sum window.  The streaming
form keeps that running token offset in checkpointed state so documents
get their (start, bin) the moment they arrive — the shape an online
batch assembler consumes without waiting for a batch re-pack.

Composition:

* **Stateless prelude** — token counts (`functions/text.tokens`) and
  the shard assignment are pure expressions, identical to batch.
* **Stateful stage** — ``applyInPandasWithState`` keyed by
  (source, shard); state = ``(next_offset, max_seen_id)``, O(1) per
  group regardless of stream length.

Contract (same as the other streaming twins, pinned by
tests/test_packing_stream.py): for an id-ordered feed, any micro-batch
slicing produces EXACTLY the batch `pack_assignments` layout.  Rows
inside one micro-batch are sorted by doc_id before assignment (arrival
order within a shuffled group is not contractual), and rows with
``doc_id <= max_seen_id`` are replays — skipped, emitting nothing, so
checkpoint recovery cannot double-advance the offset.

Scale: state is two longs per (source, shard) group; throughput is the
shuffle to the group key plus O(batch) work — the sequential dependency
is per group, exactly as in batch, and ``shards`` is the parallelism
knob at both ends.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from export_oltp_to_olap_spark.functions.text import tokens
from export_oltp_to_olap_spark.operators.sampling import _hash_bucket

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = (
    "doc_id long, source string, shard int, n_tokens long, start long, bin long"
)
STATE_SCHEMA = "next_offset long, max_seen_id long"


def _make_packer(window: int):
    def pack_group(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        next_offset, max_seen = state.get if state.exists else (0, -1)
        pdf_all = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf_all):
            pdf_all = pdf_all.sort_values("doc_id", kind="mergesort")
            fresh = pdf_all[pdf_all["doc_id"] > max_seen]
        else:
            fresh = pdf_all
        out = {k: [] for k in ("doc_id", "source", "shard", "n_tokens", "start", "bin")}
        for doc_id, n_tok in zip(fresh["doc_id"], fresh["n_tokens"]):
            out["doc_id"].append(int(doc_id))
            out["source"].append(key[0])
            out["shard"].append(int(key[1]))
            out["n_tokens"].append(int(n_tok))
            out["start"].append(next_offset)
            out["bin"].append(next_offset // window)
            next_offset += int(n_tok)
            max_seen = int(doc_id)
        state.update((next_offset, max_seen))
        yield pd.DataFrame(out)

    return pack_group


def streaming_pack_assignments(
    docs: DataFrame, window: int = 512, shards: int = 1
) -> DataFrame:
    """Online pack assignment stream: ``(doc_id, source, shard,
    n_tokens, start, bin)`` per arriving document."""
    shard = (
        (_hash_bucket(F.col("doc_id"), "pack") % shards) if shards > 1 else F.lit(0)
    ).cast("int")
    prepared = docs.select(
        "doc_id",
        "source",
        shard.alias("shard"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    return prepared.groupBy("source", "shard").applyInPandasWithState(
        _make_packer(window),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
