"""Streaming MinHash-LSH near-duplicate detection — online dedup of a
document stream.

The batch pipeline (``operators/neardup.py::minhash_lsh_neardup``) finds
near-dup pairs in a static corpus; a training-data INGEST pipeline needs
the same answer online: as each document arrives, which already-ingested
documents is it a near-duplicate of?  This module re-expresses the exact
same construction over Structured Streaming:

* **Stateless stage** — per-document MinHash band keys, computed by the
  very same column expressions as the batch path (``doc_shingle_sets`` +
  ``_minhash_wide`` + band stack), so stream and batch agree bucket for
  bucket.
* **Stateful stage** — ``applyInPandasWithState`` keyed by the LSH
  bucket ``(band, k0, k1)``: state holds the bucket's member documents
  (id + distinct shingle set); each arriving document is exact-Jaccard
  verified against the bucket's members, qualifying pairs are emitted,
  and the member list grows.  Exactly the inverted-index probe of the
  batch join, with the index living in the checkpointed state store.

Semantics and scale:

* A pair colliding in several bands is emitted once per colliding band
  (at-least-once per pair); values are identical, so a downstream
  ``dropDuplicates(["doc_a","doc_b"])`` — or any idempotent sink —
  restores exactly-once.  The batch equivalence test dedups the same way.
* Jaccard is computed from integer set sizes (`|A∩B| / (|A|+|B|−|A∩B|)`)
  — bit-identical to the batch path's Spark-double division, so stream
  and batch report the same scores.
* State per bucket is its member shingle sets — the streaming analog of
  the batch inverted index, sharded across executors by bucket key.
  ``max_members_per_bucket`` wires the online-index cap discipline
  (FIFO retention window per bucket — see ``streaming_minhash_neardup``
  for the recall trade); exact forever-membership fundamentally keeps
  the sets somewhere, so unset means state grows with the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from export_oltp_to_olap_spark.operators.neardup import (
    MINHASH_BAND_R,
    MINHASH_N_HASHES,
    _minhash_wide,
)
from export_oltp_to_olap_spark.functions.text import word_shingles

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

PAIR_OUTPUT_SCHEMA = "doc_a long, doc_b long, jaccard double"
BUCKET_STATE_SCHEMA = "ids array<long>, shs array<array<string>>"


def streaming_band_keys(
    docs: DataFrame,
    n_hashes: int = MINHASH_N_HASHES,
    band_r: int = MINHASH_BAND_R,
) -> DataFrame:
    """(doc_id, shs, band, k0, k1): one row per document per band —
    the stateless half, pure column expressions (streaming-safe)."""
    sets = docs.select(
        "doc_id", F.array_distinct(word_shingles("text", 3)).alias("shs")
    )
    n_bands = n_hashes // band_r
    wide = _minhash_wide(sets, n_hashes).join(sets, "doc_id")
    band_tuples = ", ".join(
        f"{bnd}, {', '.join(f'mh{bnd * band_r + r}' for r in range(band_r))}"
        for bnd in range(n_bands)
    )
    key_cols = ", ".join(f"k{r}" for r in range(band_r))
    return wide.select(
        "doc_id",
        "shs",
        F.expr(f"stack({n_bands}, {band_tuples}) AS (band, {key_cols})"),
    )


def _make_probe_bucket(max_members: int | None = None):
    def _probe_bucket(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.exists:
            ids, shs = state.get
            ids = list(ids)
            members = [set(s) for s in shs]
        else:
            ids, members = [], []
        known = set(ids)  # O(1) replay membership
        out_a, out_b, out_j = [], [], []
        for pdf in pdfs:
            # Deterministic intra-batch order (the groupBy shuffle does
            # not preserve source order within a key).
            if len(pdf):
                pdf = pdf.sort_values("doc_id", kind="mergesort")
            for doc_id, sh_list in zip(pdf["doc_id"], pdf["shs"]):
                s = set(sh_list)
                for mid, mset in zip(ids, members):
                    if mid == doc_id:
                        continue  # replay of a known member: no self-pair
                    inter = len(s & mset)
                    if inter == 0:
                        continue
                    jac = inter / (len(s) + len(mset) - inter)
                    if jac >= 0.8:
                        out_a.append(int(min(doc_id, mid)))
                        out_b.append(int(max(doc_id, mid)))
                        out_j.append(jac)
                if int(doc_id) not in known:
                    known.add(int(doc_id))
                    ids.append(int(doc_id))
                    members.append(s)
        if max_members is not None and len(ids) > max_members:
            ids = ids[-max_members:]  # FIFO: evict the oldest members
            members = members[-max_members:]
        state.update((ids, [sorted(m) for m in members]))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j})

    return _probe_bucket


def streaming_minhash_neardup(
    docs: DataFrame, max_members_per_bucket: int | None = None
) -> DataFrame:
    """Online near-dup pairs over a (doc_id, text) stream — emits
    ``(doc_a, doc_b, jaccard)`` with jaccard ≥ 0.8 as documents arrive
    (at-least-once per colliding band; see module docstring).

    ``max_members_per_bucket`` bounds each bucket's member index by FIFO
    eviction (a sliding retention window, like
    ``streaming_exact_dedup``): pairs are found only against the last N
    members of each bucket — a pair whose earlier side was evicted is
    missed (recall loss; every emitted pair is still exact-verified, so
    precision is unaffected).  Unset = exact batch-equivalent pair set
    with state growing as the corpus does."""
    from export_oltp_to_olap_spark import shipping

    shipping.ensure_shipped(docs.sparkSession)
    keyed = streaming_band_keys(docs)
    return keyed.groupBy("band", "k0", "k1").applyInPandasWithState(
        _make_probe_bucket(max_members_per_bucket),
        outputStructType=PAIR_OUTPUT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
