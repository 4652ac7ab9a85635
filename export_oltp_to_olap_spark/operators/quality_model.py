"""Model-based quality classification — the learned rung of the
quality-filter ladder.

The heuristic gates (`plans/text_queries.py::text_quality`) score
documents with hand-set weights; the published pipelines go one step
further and TRAIN a classifier: GPT-3 filtered CommonCrawl with a
logistic-regression quality model (positive class = curated corpora),
CCNet/fastText and RedPajama do the same with linear classifiers over
surface features.  This module is that component on Spark ML:

* features: the shared `quality_features` surface ratios plus the
  per-language marker counts (`lang_scores`) — all computed with the
  same built-in expressions the heuristic gate uses, assembled into a
  `VectorUDT` column;
* trainer: `pyspark.ml.classification.LogisticRegression` (L-BFGS) on
  weakly-labeled rows — callers bring any (features, label) pair;
  the fixture face uses lang=='en' as the weak positive, standing in
  for "resembles the curated corpus" exactly as GPT-3's filter did;
* scorer: `model.transform`, emitting the positive-class probability.

Scale (100 TB): featurization is map-side expression work; L-BFGS
training aggregates one gradient per iteration (treeAggregate — the
driver holds one coefficient vector, never rows).  Scoring is a
map-side transform.  Training on a SAMPLE (the deterministic hash
split keeps it reproducible) is the production pattern — the model has
~15 coefficients; more rows past a few million add nothing.

Determinism: with fixed maxIter/regParam and the default zero init,
L-BFGS on the same rows yields the same coefficients to fp precision;
scores are rounded to 4 decimals.  No cross-engine SQL oracle exists
for an iterative trainer (registered rows-only, like the k-means ANN
quantizers); the semantic contract is pinned by planted-signal tests.

Reference parity: none (reference has no ML surface); north-star
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import lang_scores, quality_features

FEATURE_COLS = (
    "n_chars",
    "n_tokens",
    "n_distinct_tokens",
    "punct_ratio",
    "digit_ratio",
    "space_ratio",
    "stopword_ratio",
    "distinct_ratio",
)


def quality_feature_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the numeric feature columns + a `features` vector.

    All features are the engine's existing built-in expressions — the
    assembler is the only ML-specific step.
    """
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(text_col)
    langs = lang_scores(text_col)
    out = docs
    for name in FEATURE_COLS:
        out = out.withColumn(name, feats[name].cast("double"))
    lang_cols = []
    for lang, col in langs.items():
        cname = f"lang_{lang}"
        out = out.withColumn(cname, col.cast("double"))
        lang_cols.append(cname)
    assembler = VectorAssembler(
        inputCols=list(FEATURE_COLS) + lang_cols, outputCol="features"
    )
    return assembler.transform(out)


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit the logistic quality model on (features, label) rows."""
    from pyspark.ml.classification import LogisticRegression

    if labeled.limit(1).count() == 0:
        raise ValueError(
            "quality classifier: empty training set — the trainer (like "
            "the ANN quantizers) requires a non-empty sample"
        )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return lr.fit(labeled)


def score_quality(model, docs_with_features: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, quality_prob) — positive-class probability, 4-dp rounded."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs_with_features)
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 4).alias("quality_prob"),
    )


def quality_classifier_scores(docs: DataFrame) -> DataFrame:
    """Fixture face: weak label = the rule-based lang-ID heuristic
    predicting English — "resembles the curated corpus", produced by a
    rule instead of a human, which is exactly the weak-supervision
    setup the published quality filters use (GPT-3's positive class
    was 'is in WebText', also a rule).  The model trains on the
    deterministic train split and scores every document.  (The
    fixture's `lang` METADATA column is deliberately not the label: it
    is noise w.r.t. the text — 40% agreement with the marker heuristic
    — so no learnable mapping features→metadata exists.)  Output
    (doc_id, weak_label, quality_prob) ordered by doc_id; registered
    rows-only (an iterative trainer has no SQL restatement)."""
    from export_oltp_to_olap_spark.functions.text import lang_predict
    from export_oltp_to_olap_spark.operators.sampling import assign_splits

    feat = quality_feature_frame(docs)
    labeled = feat.withColumn("label", (lang_predict("text") == "en").cast("double"))
    train = assign_splits(labeled, "doc_id").where(F.col("split") == "train")
    model = train_quality_classifier(train)
    return (
        score_quality(model, labeled)
        .join(labeled.select("doc_id", F.col("label").cast("long").alias("weak_label")), "doc_id")
        .select("doc_id", "weak_label", "quality_prob")
        .orderBy("doc_id")
    )
