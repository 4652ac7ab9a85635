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
for the iterative TRAINER (`quality_classifier_scores` stays
rows-only, like the k-means ANN quantizers; its semantic contract is
pinned by planted-signal tests) — but SCORING from the committed
artifact is a pure sigmoid-of-linear-margin transform, so
`quality_scores_saved` carries a full DuckDB oracle with the saved
coefficients inlined.

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


TRAIN_ROWS_CAP = 65_536  # ~15 coefficients saturate long before this


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
    sample_cap: int | None = TRAIN_ROWS_CAP,
):
    """Fit the logistic quality model on (features, label) rows.

    ``sample_cap`` bounds the training set (the quantizer discipline —
    `similarity.py::sampled_train_matrix`): a linear model with ~15
    coefficients gains nothing past tens of thousands of rows, and the
    cap is what makes "fit" a bounded driver-coordinated job at 100 TB
    instead of 50 full-corpus passes.  Membership = the cap smallest
    ``xxhash64(id_col)`` values (distributed TakeOrdered, stable under
    repartition/append, unbiased w.r.t. corpus order — a plain prefix
    limit would train on the FRONT of a time-ordered corpus); rows
    without ``id_col`` fall back to a prefix limit.  The capped frame
    is then COMPACTED to one partition: every L-BFGS iteration is one
    treeAggregate over the training frame, so at the capped size one
    task per iteration beats `shuffle_partitions` near-empty ones
    (measured 3.3× on the sf0.1 bench face, coefficients identical).
    ``sample_cap=None`` fits the full input untouched.
    """
    from pyspark.ml.classification import LogisticRegression

    if labeled.limit(1).count() == 0:
        raise ValueError(
            "quality classifier: empty training set — the trainer (like "
            "the ANN quantizers) requires a non-empty sample"
        )
    if sample_cap:
        if "doc_id" in labeled.columns:
            labeled = (
                labeled.withColumn("__h", F.xxhash64("doc_id"))
                .orderBy("__h", "doc_id")
                .limit(sample_cap)
                .drop("__h")
            )
        else:
            labeled = labeled.limit(sample_cap)
        labeled = labeled.coalesce(1)
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


def feature_names() -> list[str]:
    """Canonical feature order — MUST match quality_feature_frame's
    assembler inputCols (surface ratios, then lang markers in
    LANG_MARKERS insertion order) or saved coefficients shift columns."""
    from export_oltp_to_olap_spark.functions.text import LANG_MARKERS

    return list(FEATURE_COLS) + [f"lang_{lang}" for lang in LANG_MARKERS]


def save_quality_model(model, path: str) -> None:
    """Persist the trained model as a one-row JSON artifact: feature
    names (pinned order), coefficient vector, intercept.  Written
    through Spark's FS layer so DFS paths work on a cluster; ~20
    numbers, so the artifact is inspectable and diff-able — the
    train-once/score-many production pattern (the module docstring's
    point: the model is ~15 coefficients; nothing else is state)."""
    names = feature_names()
    coefs = [float(c) for c in model.coefficients.toArray()]
    if len(coefs) != len(names):
        raise ValueError(
            f"model has {len(coefs)} coefficients but the engine builds "
            f"{len(names)} features — trained on a different feature frame?"
        )
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    row = [(names, coefs, float(model.intercept))]
    spark.createDataFrame(
        row, "features array<string>, coefficients array<double>, intercept double"
    ).coalesce(1).write.mode("overwrite").json(path)


def load_quality_model(spark, path: str) -> dict:
    """Read the saved artifact back: {feature_name: coef} + intercept."""
    r = spark.read.json(path).first()
    if r is None:
        raise ValueError(f"no quality-model artifact at {path}")
    return {
        "weights": dict(zip(r["features"], r["coefficients"])),
        "intercept": float(r["intercept"]),
    }


def score_quality_saved(
    docs: DataFrame, artifact: dict, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score documents with SAVED coefficients — no retraining, no ML
    runtime: the logistic margin is a pure built-in column expression
    (sigmoid(intercept + Σ wᵢ·featureᵢ)), so scoring stays inside
    whole-stage codegen and needs only the JSON artifact.  Identical
    output contract to :func:`score_quality` (id, quality_prob 4-dp);
    round-trip equality is pinned by
    ``test_quality_model_save_load_roundtrip``."""
    from export_oltp_to_olap_spark.functions.text import lang_scores, quality_features

    feats = quality_features(text_col)
    langs = lang_scores(text_col)
    cols = {name: feats[name] for name in FEATURE_COLS}
    for lang, col in langs.items():
        cols[f"lang_{lang}"] = col
    w = artifact["weights"]
    unknown = set(w) - set(cols)
    if unknown:
        raise ValueError(f"saved model has unknown features: {sorted(unknown)}")
    margin = F.lit(float(artifact["intercept"]))
    for name, weight in w.items():
        margin = margin + F.lit(float(weight)) * cols[name].cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return docs.select(F.col(id_col), F.round(prob, 4).alias("quality_prob"))


import os

# The committed fixture artifact: trained ONCE on the sf0.001 documents
# train split (weak label = lang_predict == 'en'), ~20 numbers checked
# into the repo — the train-once/score-many production pattern made
# literal.  `quality_scores_saved` reads it; the registered face is
# therefore a pure deterministic transform with a full SQL oracle,
# unlike `quality_classifier_scores` which must retrain per call.
QUALITY_ARTIFACT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "quality_model_fixture.json",
)


def load_quality_artifact_json(path: str | None = None) -> dict:
    """Read a committed plain-JSON artifact (no Spark session needed —
    unlike :func:`load_quality_model`, which reads the Spark-FS form
    written by :func:`save_quality_model`).  Same return shape."""
    import json

    with open(path or QUALITY_ARTIFACT_PATH, encoding="utf-8") as fh:
        art = json.load(fh)
    return {
        "weights": dict(zip(art["features"], art["coefficients"])),
        "intercept": float(art["intercept"]),
    }


def quality_scores_saved(docs: DataFrame, artifact: dict | None = None) -> DataFrame:
    """Registered face: score every document with the COMMITTED
    coefficients — ``(doc_id, quality_prob)`` ordered by doc_id.  Zero
    training jobs, zero ML runtime: the whole query is built-in column
    expressions (sigmoid of a linear margin over the engineered
    features), whole-stage-codegen'd end to end, which is exactly what
    the 100 TB scoring pass runs after one bounded training job."""
    art = artifact or load_quality_artifact_json()
    return score_quality_saved(docs, art).orderBy("doc_id")


# DuckDB names for each engine feature, over the shared ``feats`` CTE
# (plans/text_queries.quality_feats_cte) — int/int divisions, so values
# are engine-identical; the greatest() guards mirror quality_features.
_FEATURE_SQL = {
    "n_chars": "n_chars",
    "n_tokens": "n_tokens",
    "n_distinct_tokens": "n_distinct_tokens",
    "punct_ratio": "n_punct / greatest(n_chars, 1)",
    "digit_ratio": "n_digits / greatest(n_chars, 1)",
    "space_ratio": "n_spaces / greatest(n_chars, 1)",
    "stopword_ratio": "n_stop / greatest(n_tokens, 1)",
    "distinct_ratio": "n_distinct_tokens / greatest(n_tokens, 1)",
}


def _margin_sql(artifact: dict) -> str:
    """The saved linear margin as a DuckDB expression over the ``feats``
    CTE columns — coefficients inlined as shortest-roundtrip literals
    (repr of a Python float parses back to the identical double),
    summed in the SAME left-to-right saved-feature order as
    `score_quality_saved` builds it, so both engines execute the same
    IEEE operation sequence."""
    from export_oltp_to_olap_spark.functions.text import sql_lang_count

    terms = [repr(artifact["intercept"])]
    for name, weight in artifact["weights"].items():
        if name.startswith("lang_"):
            fexpr = sql_lang_count(name[len("lang_"):])
        else:
            fexpr = _FEATURE_SQL[name]
        terms.append(f"{weight!r} * ({fexpr})")
    return "\n           + ".join(terms)


def quality_scores_saved_sql(artifact: dict | None = None) -> str:
    """Exact DuckDB restatement of :func:`quality_scores_saved` — the
    inlined-margin sigmoid over the shared feature CTE; only exp() can
    differ cross-engine, by ≤1 ulp, which the 4-dp round erases."""
    from export_oltp_to_olap_spark.plans.text_queries import quality_feats_cte

    art = artifact or load_quality_artifact_json()
    return f"""
WITH {quality_feats_cte()}
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({_margin_sql(art)}))), 4) AS quality_prob
FROM feats
ORDER BY doc_id
"""


def quality_calibration_bins(docs: DataFrame, artifact: dict | None = None) -> DataFrame:
    """Reliability table for the committed quality model: fixed-width
    predicted-probability bins × (count, exact mean predicted prob,
    empirical weak-label rate) — the calibration diagram every deployed
    classifier ships with, as a query.  A well-calibrated model has
    ``label_rate`` tracking ``mean_prob`` per bin; drift between them
    across rounds is a model-rot signal no single accuracy number
    shows.

    Bins: ``least(floor(prob·10), 9)`` — ten [0.1) widths with 1.0
    folded into bin 9.  Both engines compute the same doubles, so the
    bin edges cannot disagree.  The mean uses the exact-sum convention
    (4-dp probs summed as DECIMAL(18,4), one double division at the
    end); the label rate is an integer-count division.  Scale: one
    map-side scoring sweep + a ≤10-group aggregate.
    """
    from export_oltp_to_olap_spark.functions.text import lang_predict

    art = artifact or load_quality_artifact_json()
    scored = score_quality_saved(docs, art)
    labels = docs.select(
        "doc_id", (lang_predict("text") == "en").cast("long").alias("weak_label")
    )
    n = F.count(F.lit(1))
    return (
        scored.join(labels, "doc_id")
        .select(
            F.least(F.floor(F.col("quality_prob") * 10), F.lit(9))
            .cast("int")
            .alias("bin"),
            "quality_prob",
            "weak_label",
        )
        .groupBy("bin")
        .agg(
            n.cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.round("quality_prob", 4).cast("decimal(18,4)")).cast("double")
                / n,
                6,
            ).alias("mean_prob"),
            F.round(F.sum("weak_label") / n, 6).alias("label_rate"),
        )
        .orderBy("bin")
    )


def quality_calibration_sql(artifact: dict | None = None) -> str:
    """DuckDB restatement of :func:`quality_calibration_bins`: the same
    inlined margin, the same bin arithmetic on identical doubles, the
    same DECIMAL(18,4) exact summation.  The weak label restates
    ``lang_predict == 'en'`` as ``score_en = greatest(all scores) AND
    score_en > 0`` — equivalent because 'en' is first in LANG_MARKERS,
    so it wins every max tie."""
    from export_oltp_to_olap_spark.functions.text import LANG_MARKERS, sql_lang_count
    from export_oltp_to_olap_spark.plans.text_queries import quality_feats_cte

    art = artifact or load_quality_artifact_json()
    langs = list(LANG_MARKERS)
    score_cols = ",\n         ".join(
        f"{sql_lang_count(lang)} AS score_{lang}" for lang in langs
    )
    best = f"greatest({', '.join('score_' + lang for lang in langs)})"
    return f"""
WITH {quality_feats_cte()},
scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-({_margin_sql(art)}))), 4) AS quality_prob
  FROM feats
),
labs0 AS (
  SELECT doc_id,
         {score_cols}
  FROM documents
),
labs AS (
  SELECT doc_id,
         CASE WHEN score_en > 0 AND score_en = {best} THEN 1 ELSE 0 END AS weak_label
  FROM labs0
)
SELECT CAST(least(floor(quality_prob * 10), 9) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(SUM(CAST(round(quality_prob, 4) AS DECIMAL(18,4))) AS DOUBLE)
             / count(*), 6) AS mean_prob,
       round(SUM(weak_label) / count(*), 6) AS label_rate
FROM scored JOIN labs USING (doc_id)
GROUP BY 1
ORDER BY bin
"""


def weak_labeled_features(docs: DataFrame) -> DataFrame:
    """The shared weak-supervision frame: features + label (the lang-ID
    heuristic predicting English — "resembles the curated corpus",
    produced by a rule exactly as GPT-3's WebText filter was)."""
    from export_oltp_to_olap_spark.functions.text import lang_predict

    return quality_feature_frame(docs).withColumn(
        "label", (lang_predict("text") == "en").cast("double")
    )


def train_weakly_supervised(docs: DataFrame, labeled: DataFrame | None = None):
    """Fit on the deterministic train split of the weak-labeled frame —
    the train-ONCE face (`cli.py quality-model --train` persists the
    result via :func:`save_quality_model`; scoring then never retrains).

    Pass a prebuilt ``labeled`` frame (:func:`weak_labeled_features`
    output) when the caller already computed it — the featurize +
    assembler + lang-predict chain is the expensive part and must not
    be derived twice (ADVICE r5)."""
    from export_oltp_to_olap_spark.operators.sampling import assign_splits

    if labeled is None:
        labeled = weak_labeled_features(docs)
    train = assign_splits(labeled, "doc_id").where(F.col("split") == "train")
    return train_quality_classifier(train)


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
    rows-only (an iterative trainer has no SQL restatement).
    Production splits this: train once + save_quality_model, then
    score_quality_saved map-side (`cli.py quality-model`); this face
    keeps train+score in one call because the driver harness gives it
    no artifact directory."""
    labeled = weak_labeled_features(docs)
    model = train_weakly_supervised(docs, labeled=labeled)
    return (
        score_quality(model, labeled)
        .join(labeled.select("doc_id", F.col("label").cast("long").alias("weak_label")), "doc_id")
        .select("doc_id", "weak_label", "quality_prob")
        .orderBy("doc_id")
    )
