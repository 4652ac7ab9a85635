"""Streaming SemDeDup — online semantic dedup of an embedding stream.

The batch operator (`operators/semdedup.py`) curates a static corpus;
an INGEST pipeline needs the same decision online: as each embedding
arrives, is it a semantic duplicate of anything already admitted to its
cluster?  Same two-stage shape as `streaming/neardup_stream.py`:

* **Stateless stage** — nearest-centroid assignment against a FIXED
  centroid snapshot (a broadcast list; at scale, the output of a
  periodic `centroid_table`/`lloyd_kmeans` training job).  One
  vectorized pandas_udf argmax per Arrow batch — streaming-safe, no
  window, no shuffle beyond the keyed state stage.
* **Stateful stage** — ``applyInPandasWithState`` keyed by
  ``cluster_id``: state holds the cluster's members seen so far
  (id + embedding); each arrival is cosine-scored against them,
  first-seen-wins (the arrival-order form of the batch lower-id-wins
  policy — identical when the stream arrives in id order), and the
  member list grows.

Scale: state is the per-cluster member set — the streaming analog of
the batch inverted lists, sharded by cluster key across executors.
``max_members_per_cluster`` wires the cap discipline: the witness pool
retains only each cluster's first N members, bounding state at O(C·N)
for the documented recall trade (see ``streaming_semantic_dedup``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from export_oltp_to_olap_spark.operators.semdedup import SEMDEDUP_THRESHOLD

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = "vec_id long, cluster_id long, kept boolean, dup_cos double"
CLUSTER_STATE_SCHEMA = "ids array<long>, embs array<array<double>>"


def streaming_assign_clusters(
    embeddings: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, embedding, cluster_id): stateless nearest-centroid
    assignment against the fixed snapshot (cosine argmax; ties resolve
    to the lowest cen_id, matching the batch row_number tiebreak —
    ``centroids`` must be sorted by cen_id)."""
    from pyspark.sql.functions import pandas_udf

    cen_ids = [int(c) for c, _ in centroids]
    cen_mat = [[float(v) for v in e] for _, e in centroids]

    @pandas_udf("long")
    def assign(emb):
        import numpy as np
        import pandas as pd

        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        C = np.asarray(cen_mat, dtype=np.float64)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        X = np.vstack(emb.to_numpy()).astype(np.float64, copy=False)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ Cn.T  # (n, k)
        idx = sims.argmax(axis=1)  # first max = lowest cen_id on ties
        return pd.Series(np.asarray(cen_ids, dtype=np.int64)[idx])

    return embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        assign(F.col("embedding")).alias("cluster_id"),
    )


def _make_probe_cluster(threshold: float, max_members: int | None = None):
    def probe(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        if state.exists:
            ids, embs = state.get
            ids = list(ids)
            members = [np.asarray(e, dtype=np.float64) for e in embs]
        else:
            ids, members = [], []
        seen = set(ids)  # O(1) replay membership (the id list is state order)
        out: dict[str, list] = {"vec_id": [], "cluster_id": [], "kept": [], "dup_cos": []}
        cluster_id = int(key[0])
        # Concatenate and sort the micro-batch by vec_id: after the
        # groupBy shuffle Spark does NOT guarantee intra-group arrival
        # order, so scoring in raw iterator order would make decisions
        # depend on partitioning.  Sorting makes each micro-batch's
        # decisions deterministic (and == batch lower-id-wins whenever
        # ids are assigned in arrival order).
        pdf_all = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf_all):
            pdf_all = pdf_all.sort_values("vec_id", kind="mergesort")
        for vec_id, emb in zip(pdf_all["vec_id"], pdf_all["embedding"]):
            if int(vec_id) in seen:
                continue  # replay of a known member: already decided
            x = np.asarray(emb, dtype=np.float64)
            xn = np.linalg.norm(x)
            dup_cos = None
            if members:
                M = np.vstack(members)
                cos = np.round(
                    (M @ x) / (np.linalg.norm(M, axis=1) * xn), 6
                )
                hits = cos[cos >= threshold]
                if len(hits):
                    dup_cos = float(hits.max())
            out["vec_id"].append(int(vec_id))
            out["cluster_id"].append(cluster_id)
            out["kept"].append(dup_cos is None)
            out["dup_cos"].append(dup_cos)
            # State cap: witness pool keeps only the FIRST max_members
            # members (they out-rank later arrivals under first-seen-wins
            # anyway).  Later vectors still get decisions, but a dup whose
            # only witness was evicted is missed — bounded state traded
            # for bounded recall loss (see streaming_semantic_dedup).
            if max_members is None or len(ids) < max_members:
                seen.add(int(vec_id))
                ids.append(int(vec_id))
                members.append(x)
        # plain-Python floats: the state store's pickler rejects numpy scalars
        state.update((ids, [[float(v) for v in m] for m in members]))
        yield pd.DataFrame(out)

    return probe


def streaming_semantic_dedup(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = SEMDEDUP_THRESHOLD,
    max_members_per_cluster: int | None = None,
) -> DataFrame:
    """Online keep/drop decisions over a (vec_id, embedding) stream —
    emits (vec_id, cluster_id, kept, dup_cos) as vectors arrive;
    first-seen-wins against the cluster's accumulated members.

    ``max_members_per_cluster`` bounds state: each cluster's witness pool
    keeps only its first N members, so state is O(C·N) regardless of
    stream length.  The trade, explicitly: (a) a duplicate whose only
    witness arrived post-cap is KEPT (recall loss, no false drops — every
    emitted drop still names a real witness); (b) replay-idempotence
    holds only for vectors inside the retained pool — a post-cap vector
    replayed in a later micro-batch is re-decided (same verdict either
    way, since verdicts depend only on the retained pool).  Unset = exact
    batch-equivalent semantics with unbounded state."""
    from export_oltp_to_olap_spark import shipping

    shipping.ensure_shipped(embeddings.sparkSession)
    assigned = streaming_assign_clusters(embeddings, centroids)
    return assigned.groupBy("cluster_id").applyInPandasWithState(
        _make_probe_cluster(threshold, max_members_per_cluster),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=CLUSTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
