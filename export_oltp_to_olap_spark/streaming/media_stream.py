"""Streaming media exact dedup — the binary-column keeper ledger at
ingest.

The batch face (`multimodal/media.py::media_exact_dedup`) hashes stored
blobs and picks min-id keepers per digest group; a media INGEST pipeline
wants the same ledger online: as each item arrives, is it a byte-exact
copy of something already ingested, and who is the keeper?  Same split
as every streaming face here:

* **Stateless stage** — ``sha2(content, 256)`` per item, the identical
  JVM expression the batch path uses, so stream and batch agree digest
  for digest.
* **Stateful stage** — ``applyInPandasWithState`` keyed by the digest:
  state is one long (the group's canonical id).  Each arriving item is
  assigned ``min(state, min of batch arrivals)`` — under the engine's
  append-only ingest convention (ids are monotone across batches, the
  `curated_delta` precondition), that IS the batch face's min-id keeper,
  so stream ≡ batch exactly (pinned by pytest with planted cross-batch
  duplicates).

State per digest group is a single long — the cheapest standing index in
the engine; a 100 TB media lake's dedup ledger is one row per DISTINCT
blob, sharded by digest.  Replays are idempotent (emission is a pure
function of state + arrival ids).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

LEDGER_OUTPUT_SCHEMA = "media_id long, content_sha string, canonical_id long"
LEDGER_STATE_SCHEMA = "canonical long"


def _assign_canonical(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(i) for i in pdf["media_id"])
    if not ids:  # timeout-only invocation: nothing to emit
        yield pd.DataFrame({"media_id": [], "content_sha": [], "canonical_id": []})
        return
    canonical = min(ids)
    if state.exists:
        (prev,) = state.get
        canonical = min(canonical, int(prev))
    state.update((canonical,))
    ids.sort()
    yield pd.DataFrame(
        {
            "media_id": ids,
            "content_sha": [key[0]] * len(ids),
            "canonical_id": [canonical] * len(ids),
        }
    )


def streaming_media_exact_dedup(media_stream: DataFrame) -> DataFrame:
    """Online keeper ledger over a media stream: one output row per
    arriving item — ``(media_id, content_sha, canonical_id)``;
    ``media_id == canonical_id`` marks first-seen keepers, anything else
    is a byte-exact duplicate of the named keeper.

    Precondition (documented, same as `curated_delta`): append-only
    ingest with monotone ids — an id smaller than an already-ingested
    copy's would be assigned as keeper by the batch face but cannot
    retro-correct earlier emissions here.
    """
    from export_oltp_to_olap_spark import shipping

    shipping.ensure_shipped(media_stream.sparkSession)
    hashed = media_stream.select(
        "media_id", F.sha2(F.col("content"), 256).alias("content_sha")
    )
    return hashed.groupBy("content_sha").applyInPandasWithState(
        _assign_canonical,
        outputStructType=LEDGER_OUTPUT_SCHEMA,
        stateStructType=LEDGER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
