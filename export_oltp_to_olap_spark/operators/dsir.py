"""DSIR-shaped importance scoring — data selection toward a target
distribution (Xie et al., arXiv:2302.03169).

DSIR selects pretraining data by importance weight between a TARGET
distribution (the data you want more of) and the RAW pool, both
modeled over hashed n-gram features:

    log w(doc) = Σ_g  [ log p_target(g) − log p_raw(g) ]

This module keeps DSIR's estimator shape but replaces the
transcendental logs with the same integer proxy `operators/lm.py` uses
for its KenLM stand-in: ``floor(log2(1 + count))`` per side, plus the
normalization constant ``bucket(R) − bucket(T)`` (the integer form of
the ``/total`` in p = count/total — without it the target, being a
subset of the pool, could never outscore it).  Every per-gram weight
is an integer and the per-doc mean is an int/int division — monotone
in the true log-ratio to first order, and bit-identical across
engines (full DuckDB oracle, no rows-only fallback).

Fixture face: target = documents the marker heuristic predicts
English (the same weak-supervision proxy the quality classifier
trains on — "looks like the curated distribution"), raw = the whole
corpus.  Documents rich in target-distinctive grams score positive;
boilerplate shared with the raw pool scores ~0; anti-target text
scores negative.  ``keep = w_sum > 0`` — the UNROUNDED importance is
positive — is the DSIR-style selection bit (a doc with
0 < w_sum/n_grams < 5e-7 reports importance 0.0 at 6 dp yet
keep=true, which is intended: the bit tracks the sign, not the
rounded display value; the paper resamples ∝ w, the deterministic
threshold keeps the fixture oracle-checkable — `operators/sampling.py::
weighted_sample` is the resampling form when a stochastic draw is
wanted).

Scale (100 TB): two vocab-capped count models (one partial-agg shuffle
each, the target one over the target subset), broadcast-joined onto
one exploded gram stream, one per-doc aggregation — exactly the
`lm_fluency_scores` plan run twice on shared scans.  Nothing iterates,
nothing is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import SQL_TOKENS, lang_predict
from export_oltp_to_olap_spark.operators.lm import MAX_VOCAB, _doc_grams, train_gram_model

DSIR_N = 1  # unigram features: the paper's hashed-ngram default order


def _bucket(cnt):
    """floor(log2(1 + cnt)) as an integer expression (lm.py convention)."""
    return (F.length(F.bin(F.coalesce(cnt, F.lit(0)) + 1)) - 1).cast("long")


def _bucket_py(cnt: int) -> int:
    """Driver-side twin of ``_bucket`` for the normalization scalars."""
    return (1 + cnt).bit_length() - 1


def _grams_col(n: int):
    from export_oltp_to_olap_spark.functions.text import tokens, word_shingles

    return tokens("text") if n == 1 else word_shingles("text", n)


def dsir_scores(
    docs: DataFrame,
    target_docs: DataFrame,
    n: int = DSIR_N,
    max_vocab: int = MAX_VOCAB,
) -> DataFrame:
    """(doc_id, n_grams, importance, keep) for every doc with ≥1 gram.

    ``importance`` = mean over the doc's grams of
    ``bucket(count_target) − bucket(count_raw) + (bucket(R) − bucket(T))``
    (integer log2 damping per side plus the size normalization),
    rounded 6dp.  ``keep`` = importance > 0.
    """
    target_model = train_gram_model(target_docs, n, max_vocab).withColumnRenamed(
        "cnt", "cnt_t"
    )
    raw_model = train_gram_model(docs, n, max_vocab).withColumnRenamed("cnt", "cnt_r")
    # Normalization: DSIR's ratio is p_target/p_raw = (cnt_t/T)/(cnt_r/R).
    # Without the /T and /R the target (a subset of the pool) can never
    # win — cnt_r ≥ cnt_t for every gram.  In integer-bucket space the
    # normalization is the constant offset bucket(R) − bucket(T), folded
    # into every gram weight.  T and R are two scalar aggregates
    # (bounded driver transfer, like every model bound here).
    t_total = target_docs.select(F.explode(_grams_col(n)).alias("g")).count()
    r_total = docs.select(F.explode(_grams_col(n)).alias("g")).count()
    # Degenerate empty target: p_target is undefined — drop the offset so
    # every gram scores bucket(0) − bucket(cnt_r) ≤ 0 (nothing selected).
    norm = (_bucket_py(r_total) - _bucket_py(t_total)) if t_total > 0 else 0
    weights = _bucket(F.col("cnt_t")) - _bucket(F.col("cnt_r")) + F.lit(norm)
    scored = (
        _doc_grams(docs, n, "doc_id", "text")
        .join(F.broadcast(target_model), "g", "left")
        .join(F.broadcast(raw_model), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(weights).cast("long").alias("w_sum"),
        )
    )
    return scored.select(
        "doc_id",
        "n_grams",
        F.round(F.col("w_sum") / F.col("n_grams"), 6).alias("importance"),
        (F.col("w_sum") > 0).alias("keep"),
    ).orderBy("doc_id")


def dsir_importance(docs: DataFrame) -> DataFrame:
    """Fixture face: target = marker-heuristic English docs."""
    target = docs.where(lang_predict("text") == "en")
    return dsir_scores(docs, target)


def dsir_importance_sql(n: int = DSIR_N, max_vocab: int = MAX_VOCAB) -> str:
    """DuckDB restatement (same n/cap; unigram grams = the token list).

    The target set restates ``lang_predict(text) == 'en'`` with the
    SAME marker lists and first-wins tiebreak (`functions/text.py`:
    'en' is first in LANG_MARKERS, so "score_en == best AND best > 0"
    is exactly the predicted-English set).
    """
    from export_oltp_to_olap_spark.functions.text import LANG_MARKERS, sql_lang_count

    toks = SQL_TOKENS.format(t="text")
    assert n == 1, "SQL restatement is written for the unigram default"
    assert next(iter(LANG_MARKERS)) == "en", "tiebreak restatement assumes en-first"
    score_cols = ",\n           ".join(
        f"{sql_lang_count(lang)} AS s_{lang}" for lang in LANG_MARKERS
    )
    best = f"greatest({', '.join('s_' + lang for lang in LANG_MARKERS)})"
    return f"""
WITH base AS (
  SELECT doc_id, text, {toks} AS t FROM documents
),
doc_grams AS (
  SELECT doc_id, md5(u.tok) AS g
  FROM base, unnest(t) AS u(tok)
),
target_ids AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           {score_cols}
    FROM documents
  )
  WHERE {best} > 0 AND s_en = {best}
),
target_model AS (
  SELECT g, CAST(count(*) AS BIGINT) AS cnt_t
  FROM doc_grams JOIN target_ids USING (doc_id)
  GROUP BY g ORDER BY cnt_t DESC, g LIMIT {max_vocab}
),
raw_model AS (
  SELECT g, CAST(count(*) AS BIGINT) AS cnt_r
  FROM doc_grams
  GROUP BY g ORDER BY cnt_r DESC, g LIMIT {max_vocab}
),
totals AS (
  SELECT CASE WHEN (SELECT count(*) FROM doc_grams JOIN target_ids USING (doc_id)) = 0
              THEN 0
              ELSE (length(bin(CAST((SELECT count(*) FROM doc_grams) AS BIGINT) + 1)) - 1)
                 - (length(bin(CAST((SELECT count(*) FROM doc_grams JOIN target_ids USING (doc_id)) AS BIGINT) + 1)) - 1)
         END AS norm
),
scored AS (
  SELECT d.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum((length(bin(coalesce(t.cnt_t, 0) + 1)) - 1)
                - (length(bin(coalesce(r.cnt_r, 0) + 1)) - 1)) AS BIGINT)
           + CAST(count(*) AS BIGINT) * (SELECT norm FROM totals) AS w_sum
  FROM doc_grams d
  LEFT JOIN target_model t USING (g)
  LEFT JOIN raw_model r USING (g)
  GROUP BY d.doc_id
)
SELECT doc_id, n_grams,
       round(w_sum / n_grams, 6) AS importance,
       w_sum > 0 AS keep
FROM scored
ORDER BY doc_id
""".strip()


DSIR_IMPORTANCE_SQL = dsir_importance_sql()
