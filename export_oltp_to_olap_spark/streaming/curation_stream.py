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
    if eval_docs is not None:
        from export_oltp_to_olap_spark.operators.decontam import flag_contaminated

        gated = (
            flag_contaminated(gated, eval_docs)
            .where(~F.col("contaminated"))
            .drop("contaminated")
        )
    admitted = streaming_exact_dedup(
        gated.select("doc_id", "fp"), max_state_per_bucket=max_state_per_bucket
    )
    return assign_splits(admitted, "doc_id")
