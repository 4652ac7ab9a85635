"""Streaming corpus curation — the batch curation chain at INGEST time.

``plans/curation.py`` curates a static corpus; a training-data pipeline
that consumes a live document firehose wants the same gates applied as
documents arrive, so rejected/duplicate documents never land in the
lake at all.  Composition of already-tested parts:

* **Stateless gates** — language-ID + quality scoring are pure column
  expressions (``functions/text.py``), streaming-safe as-is; the split
  assignment (``operators/sampling.py::assign_splits``) is a pure hash
  of ``doc_id``, so a document's split never depends on when it arrives.
* **Stateful exact dedup** — ``streaming/stateful.py::
  streaming_exact_dedup`` keeps the first-seen copy of each distinct
  text across micro-batches (checkpointed seen-set, sharded by
  fingerprint prefix; optional FIFO state cap).

Near-dup dropping is deliberately NOT in the online chain: the batch
prefix-filter join needs the whole candidate index, and its streaming
form already exists separately (``streaming/neardup_stream.py``).  A
production pipeline runs this gate online and compacts near-dups in the
periodic batch pass — the standard lambda split, each half tested
against the same batch truth.

Stream ≡ batch contract (pinned by tests/test_curation_stream.py): for
any micro-batch slicing of an id-ordered feed, the admitted set equals
``curated_docs`` (gates + exact dedup) of the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import lang_predict, quality_score
from export_oltp_to_olap_spark.operators.sampling import assign_splits
from export_oltp_to_olap_spark.operators.staging import stage
from export_oltp_to_olap_spark.plans.curation import QUALITY_MIN
from export_oltp_to_olap_spark.streaming.stateful import streaming_exact_dedup


def gate_documents(docs: DataFrame, quality_min: float = QUALITY_MIN) -> DataFrame:
    """Stateless admission gates: language + quality + fingerprint.

    Identical expressions to the batch ``curated_docs`` gate stage, so
    stream and batch agree document for document."""
    return (
        docs.select("doc_id", "text")
        .withColumn("quality", quality_score("text"))
        .withColumn("pred_lang", lang_predict("text"))
        .where((F.col("pred_lang") == "en") & (F.col("quality") >= quality_min))
        .withColumn("fp", F.md5("text"))
        .drop("pred_lang")
    )


def streaming_curated_docs(
    docs: DataFrame,
    quality_min: float = QUALITY_MIN,
    max_state_per_bucket: int | None = None,
    eval_docs: DataFrame | None = None,
    lm_model=None,
    lm_min: float | None = None,
    eval_hashes=None,
) -> DataFrame:
    """Online curation: (doc_id, fp, split) of every ADMITTED document —
    gated, first-seen-deduped, split-assigned as it arrives.

    The emitted stream is what an ingest sink appends to the lake's
    curated table.  ``max_state_per_bucket`` bounds dedup state (FIFO
    retention window — see ``streaming_exact_dedup`` for the trade).

    ``eval_docs`` (a STATIC benchmark corpus) adds an online
    decontamination gate: documents sharing any word n-gram with the
    eval set are rejected at ingest.  The gate is the stateless
    per-row flag (`operators/decontam.flag_contaminated` — broadcast
    hash table + vectorized membership), not the batch join, so it
    composes into the stream without state or stream-stream joins and
    agrees with the batch `contamination_hits` decision doc-for-doc.
    Pass ``eval_hashes`` (the persisted `decontam.eval_gram_hashes`
    artifact — the STANDING eval-gram set) instead of ``eval_docs`` to
    skip re-shingling the benchmark suite at every query start: the
    steady-state ingest path computes it once, stores it beside the
    standing curated tables, and hands the array straight to the gate.

    ``lm_model`` (the ``operators/lm.model_count_arrays`` of a STATIC
    reference corpus) + ``lm_min`` add an online LM fluency gate — the
    CCNet perplexity filter at ingest.  Like decontamination it is the
    stateless per-row form (`lm.with_fluency_score`: broadcast count
    table, one searchsorted per Arrow batch), and its scores equal the
    batch `lm_score_docs` doc-for-doc; docs with no n-gram (score NULL)
    are rejected when the gate is on."""
    gated = gate_documents(docs, quality_min)
    if lm_model is not None and lm_min is not None:
        from export_oltp_to_olap_spark.operators.lm import with_fluency_score

        gated = (
            with_fluency_score(gated, lm_model)
            .where(F.col("lm_score") >= lm_min)
            .drop("lm_score")
        )
    if eval_docs is not None or eval_hashes is not None:
        from export_oltp_to_olap_spark.operators.decontam import flag_contaminated

        gated = (
            flag_contaminated(gated, eval_docs, eval_hashes=eval_hashes)
            .where(~F.col("contaminated"))
            .drop("contaminated")
        )
    admitted = streaming_exact_dedup(
        gated.select("doc_id", "fp"), max_state_per_bucket=max_state_per_bucket
    )
    return assign_splits(admitted, "doc_id")


# ---------------------------------------------------------------------------
# Incremental leakage-safe splits (VERDICT r4 item 7)
# ---------------------------------------------------------------------------


def incremental_cluster_split_assign(
    standing_docs: DataFrame | None,
    standing_clusters: DataFrame | None,
    delta_docs: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """One ingest batch of the CLUSTER-keyed split assignment
    (`plans/leakage.py::leakage_safe_split_summary`'s per-doc form):
    delta docs join the standing near-dup cluster map; genuinely new
    families get fresh canonical ids.  Returns ``(delta_assign,
    updated_clusters)`` — (doc_id, canonical_id, split) for the delta,
    and the standing map with the batch folded in (feed it back next
    batch).

    Construction: `minhash_lsh_neardup_delta` finds only delta-touching
    pairs; standing endpoints are CONTRACTED to their canonical ids
    (the standing map already holds the closure of everything older),
    and `neardup_clusters`' min-label propagation runs on the contracted
    graph — nodes = delta ids + touched standing canonicals, edges =
    contracted pairs — which is O(batch + touched families), never
    O(corpus).  Under the append-only invariant (standing ids < delta
    ids) the contracted component minimum equals the full-rebuild
    component minimum, so each batch's assignment ≡ the batch rebuild
    over everything seen so far, restricted to the batch ids (pinned by
    tests/test_curation_stream.py).

    Merge semantics: a delta doc bridging two standing families merges
    them FORWARD — the updated map relabels both to the smaller
    canonical so later batches see one family, but documents emitted in
    earlier batches keep their already-shipped split (a stream cannot
    recall what it emitted).  The periodic batch pass is the repair for
    that bounded staleness — the same lambda split as near-dup dropping
    (module docstring).
    """
    from export_oltp_to_olap_spark.operators.neardup import (
        minhash_lsh_neardup_delta,
        minhash_neardup_clusters,
        neardup_clusters,
    )

    delta_ids = delta_docs.select("doc_id")
    if standing_docs is None or standing_clusters is None:
        boot = minhash_neardup_clusters(delta_docs).select("doc_id", "canonical_id")
        return assign_splits(boot, "canonical_id"), boot

    pairs = minhash_lsh_neardup_delta(standing_docs, delta_docs)
    m = standing_clusters.select("doc_id", "canonical_id")
    edges = (
        pairs.join(
            m.select(
                F.col("doc_id").alias("doc_a"), F.col("canonical_id").alias("can_a")
            ),
            "doc_a",
            "left",
        )
        .join(
            m.select(
                F.col("doc_id").alias("doc_b"), F.col("canonical_id").alias("can_b")
            ),
            "doc_b",
            "left",
        )
        .select(
            F.coalesce("can_a", "doc_a").alias("doc_a"),
            F.coalesce("can_b", "doc_b").alias("doc_b"),
        )
        .where(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    nodes = (
        delta_ids.unionByName(edges.select(F.col("doc_a").alias("doc_id")))
        .unionByName(edges.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    contracted = stage(
        neardup_clusters(nodes, edges).select("doc_id", "canonical_id")
    )

    delta_assign = assign_splits(
        contracted.join(delta_ids, "doc_id"), "canonical_id"
    )
    # forward-merge the map: standing families whose canonical node got a
    # smaller label are relabeled; the batch's rows are appended.
    remap = contracted.where(F.col("doc_id") != F.col("canonical_id")).select(
        F.col("doc_id").alias("old_can"), F.col("canonical_id").alias("new_can")
    )
    updated = (
        m.join(remap, m.canonical_id == F.col("old_can"), "left")
        .select(
            "doc_id",
            F.coalesce("new_can", "canonical_id").alias("canonical_id"),
        )
        .unionByName(
            delta_assign.select("doc_id", "canonical_id")
        )
    )
    return delta_assign, updated


def leakage_safe_split_sink(emit, state_dir: str | None = None):
    """foreachBatch driver for :func:`incremental_cluster_split_assign`:
    maintains the standing docs + cluster map across micro-batches
    (staged each batch so lineage never stacks) and calls ``emit`` with
    each batch's (doc_id, canonical_id, split) rows.  Usage::

        stream.writeStream.foreachBatch(leakage_safe_split_sink(emit))

    Retry safety: ``foreachBatch`` is at-least-once, so a failed epoch
    can be REDELIVERED with the same ``batch_id``; folding it twice
    would union duplicate doc rows into the standing state and violate
    `minhash_lsh_neardup_delta`'s disjoint-id precondition.  The sink
    therefore records the last folded ``batch_id`` and no-ops (without
    re-emitting) on a duplicate or stale epoch.

    ``state_dir`` is the PRODUCTION form: standing docs + cluster map
    persist as VERSIONED parquet directories (``v{batch_id}/docs``,
    ``v{batch_id}/clusters``, with a ``_COMMITTED`` marker written
    LAST), and the sink reloads the latest committed version at its
    first batch — a checkpoint restart of the query resumes with the
    standing state it durably folded instead of an empty map (pinned by
    the restart test in tests/test_curation_stream.py).  Commit
    protocol per epoch: emit → write both tables under the new version
    → write marker → prune older committed versions.  A crash between
    emit and marker refolds the epoch from the prior version on
    redelivery, so ``emit`` is at-least-once (key downstream writes by
    the emitted rows / batch id); the state itself is exactly-once.
    Like `sources/layout.py::compact_parquet`, the version bookkeeping
    uses local-filesystem listing — on a cluster point ``state_dir`` at
    a fuse/NFS mount or swap the marker logic for your object store's
    conditional put (the table-format commit pattern).

    Without ``state_dir`` the state lives in this closure — a restart
    starts empty while the source skips processed files; that form is
    for single-process runs and tests.
    """
    import os
    import shutil

    state: dict = {"docs": None, "clusters": None, "last_batch_id": None}

    def _committed_versions() -> list[int]:
        if not os.path.isdir(state_dir):
            return []
        return sorted(
            int(name[1:])
            for name in os.listdir(state_dir)
            if name.startswith("v")
            and os.path.exists(os.path.join(state_dir, name, "_COMMITTED"))
        )

    if state_dir is not None:
        versions = _committed_versions()
        if versions:
            # DataFrames load lazily at the first batch (needs the session).
            state["last_batch_id"] = versions[-1]

    def _vdir(batch_id: int) -> str:
        return os.path.join(state_dir, f"v{batch_id:08d}")

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        if state["last_batch_id"] is not None and _batch_id <= state["last_batch_id"]:
            return  # at-least-once redelivery of an already-folded epoch
        if state_dir is not None and state["docs"] is None and state["last_batch_id"] is not None:
            latest = _vdir(state["last_batch_id"])
            spark = batch_df.sparkSession
            state["docs"] = spark.read.parquet(os.path.join(latest, "docs"))
            state["clusters"] = spark.read.parquet(os.path.join(latest, "clusters"))
        if batch_df.isEmpty():
            if state_dir is None:
                state["last_batch_id"] = _batch_id
            # durable mode: nothing to fold, nothing to commit — the
            # ≤-guard makes a redelivered empty epoch a no-op anyway.
            return
        batch = stage(batch_df.select("doc_id", "text"))
        assign, updated = incremental_cluster_split_assign(
            state["docs"], state["clusters"], batch
        )
        # materialize the assignment BEFORE state mutates under it
        assign = stage(assign)
        emit(assign)
        new_docs = (
            batch if state["docs"] is None else state["docs"].unionByName(batch)
        )
        if state_dir is None:
            state["clusters"] = stage(updated)
            state["docs"] = stage(new_docs) if state["docs"] is not None else batch
            state["last_batch_id"] = _batch_id
            return
        vdir = _vdir(_batch_id)
        if os.path.exists(vdir):
            shutil.rmtree(vdir)  # uncommitted leftovers from a crashed epoch
        updated.write.mode("overwrite").parquet(os.path.join(vdir, "clusters"))
        new_docs.write.mode("overwrite").parquet(os.path.join(vdir, "docs"))
        with open(os.path.join(vdir, "_COMMITTED"), "w", encoding="utf-8") as fh:
            fh.write(str(_batch_id))
        for v in _committed_versions()[:-1]:
            shutil.rmtree(_vdir(v), ignore_errors=True)
        spark = batch_df.sparkSession
        state["docs"] = spark.read.parquet(os.path.join(vdir, "docs"))
        state["clusters"] = spark.read.parquet(os.path.join(vdir, "clusters"))
        state["last_batch_id"] = _batch_id

    return sink
