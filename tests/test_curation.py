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
