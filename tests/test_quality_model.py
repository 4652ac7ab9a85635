"""Semantic contract for the learned quality classifier
(`operators/quality_model.py`): planted-signal separation, held-out
generalization on the fixture corpus, and run-to-run determinism.
(No SQL oracle exists for an iterative trainer — registered rows-only,
like the k-means ANN quantizers.)"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from export_oltp_to_olap_spark.operators import quality_model as qm
from export_oltp_to_olap_spark.sources.parquet import load_tables

_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

_CLEAN = "the cat is on the mat and the dog is in the house of a friend"
_NOISE = "zx9!! q#w 77@@ kj$% 00^& asdf9 ppq2 %%zz 4r4r !!x 9zzq w0w0"


def test_planted_signal_separates(spark):
    rows = [(i, _CLEAN + f" extra {i}") for i in range(20)] + [
        (100 + i, _NOISE + f" {i}!!") for i in range(20)
    ]
    feat = qm.quality_feature_frame(spark.createDataFrame(rows, _DOC_SCHEMA))
    labeled = feat.withColumn("label", (F.col("doc_id") < 100).cast("double"))
    model = qm.train_quality_classifier(labeled)
    scored = {r["doc_id"]: r["quality_prob"] for r in qm.score_quality(model, labeled).collect()}
    clean = [scored[i] for i in range(20)]
    noise = [scored[100 + i] for i in range(20)]
    assert min(clean) > max(noise), (
        f"no separation: clean min {min(clean)} vs noise max {max(noise)}"
    )


def test_fixture_scores_generalize_to_weak_label(spark, sf001):
    docs = load_tables(spark, sf001, ("documents",))["documents"]
    out = qm.quality_classifier_scores(docs).collect()
    assert len(out) == docs.count()
    acc = sum(
        1 for r in out if (r["quality_prob"] >= 0.5) == (r["weak_label"] == 1)
    ) / len(out)
    # Trained on the 80% split, scored on ALL docs incl. held-out 20%.
    assert acc >= 0.9, f"classifier accuracy {acc:.3f} vs weak label"


def test_scores_are_deterministic_across_runs(spark, sf001):
    docs = load_tables(spark, sf001, ("documents",))["documents"]
    a = sorted((r["doc_id"], r["quality_prob"]) for r in qm.quality_classifier_scores(docs).collect())
    b = sorted((r["doc_id"], r["quality_prob"]) for r in qm.quality_classifier_scores(docs).collect())
    assert a == b
