"""Curation pipeline: every stage must actually filter on the fixture
corpus, and the final yield must reconcile with the stage-by-stage
counts — otherwise the composed query silently degenerates to a
pass-through and the oracle match proves nothing about the chain.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import lang_predict, quality_score
from export_oltp_to_olap_spark.operators.neardup import ngram_jaccard_pairs
from export_oltp_to_olap_spark.plans.curation import (
    NEARDUP_THRESHOLD,
    QUALITY_MIN,
    corpus_curation_summary,
)


def test_stages_each_filter_and_yield_reconciles(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet").select("doc_id", "text")
    n_all = docs.count()

    gated = (
        docs.withColumn("quality", quality_score("text"))
        .withColumn("pred_lang", lang_predict("text"))
        .where((F.col("pred_lang") == "en") & (F.col("quality") >= QUALITY_MIN))
    )
    n_gated = gated.count()
    assert 0 < n_gated < n_all, "lang/quality gates filtered nothing (or everything)"

    w = Window.partitionBy("text")
    deduped = (
        gated.withColumn("min_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("min_id"))
        .drop("min_id")
    )
    n_deduped = deduped.count()
    assert n_deduped <= n_gated

    n_dropped = (
        ngram_jaccard_pairs(deduped, n=3, threshold=NEARDUP_THRESHOLD)
        .select("doc_b")
        .distinct()
        .count()
    )
    assert n_dropped > 0, "near-dup stage filtered nothing — vacuous composition"

    summary = corpus_curation_summary(docs).collect()
    assert {r.split for r in summary} <= {"train", "val", "test"}
    assert sum(r.n_docs for r in summary) == n_deduped - n_dropped
    assert all(r.n_tokens > 0 and r.sum_quality > 0 for r in summary)


def test_curation_audit_ledger_semantics(spark, sf0001):
    """The provenance ledger must (a) cover every input doc exactly once,
    (b) attribute dedup drops to the surviving keeper, and (c) agree with
    curated_corpus on the kept set and splits — same input, same fate."""
    from export_oltp_to_olap_spark.plans.curation import (
        curated_corpus,
        curation_audit,
    )

    base = spark.read.parquet(f"{sf0001}/documents.parquet").select("doc_id", "text")
    max_id = base.agg(F.max("doc_id")).first()[0]

    # Plant twins of a KEPT document: a verbatim copy (must die at the
    # exact-dedup stage, keeper = the original) and a one-token append
    # (shares n/(n+1) of the copy's 3-gram shingles -> near-dup, same
    # keeper).  sf0.001 exercises lang/quality/near-dup organically but
    # has no verbatim post-gate twins, so exact-dup needs the plant.
    audit0 = {r.doc_id: r for r in curation_audit(base).collect()}
    kept0 = sorted(i for i, r in audit0.items() if r.status == "kept")
    assert kept0, "no kept docs at sf0.001 — fixture drifted"
    k = kept0[0]
    k_text = base.where(F.col("doc_id") == k).first().text
    planted = spark.createDataFrame(
        [(max_id + 1, k_text), (max_id + 2, k_text + " trailing")],
        "doc_id long, text string",
    )
    audit = {r.doc_id: r for r in curation_audit(base.unionByName(planted)).collect()}

    # (a) one ledger row per input doc; statuses from the closed set.
    assert len(audit) == len(audit0) + 2
    assert {r.status for r in audit.values()} <= {
        "kept", "dropped_lang", "dropped_quality",
        "dropped_exact_dup", "dropped_near_dup",
    }

    # (b) keeper attribution: the verbatim twin dies on the exact rung,
    # the near twin on the near rung, both pointing at the original.
    exact = audit[max_id + 1]
    assert exact.status == "dropped_exact_dup" and exact.keeper_id == k
    near = audit[max_id + 2]
    assert near.status == "dropped_near_dup" and near.keeper_id == k
    # keeper/split nullability contract
    for r in audit.values():
        if r.status in ("dropped_exact_dup", "dropped_near_dup"):
            assert r.keeper_id is not None and r.split is None
        else:
            assert r.keeper_id is None
        assert (r.split is not None) == (r.status == "kept")

    # (c) the ledger's kept set IS curated_corpus's output, split and all.
    corpus = curated_corpus(base.unionByName(planted)).select("doc_id", "split")
    expect = {(i, r.split) for i, r in audit.items() if r.status == "kept"}
    assert {(r.doc_id, r.split) for r in corpus.collect()} == expect
