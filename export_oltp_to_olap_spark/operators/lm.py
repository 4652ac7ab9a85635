"""Count-based n-gram LM fluency scoring — the perplexity-filter shape.

CCNet (Wenzek et al., arXiv:1911.00359) and the pipelines derived from
it (RedPajama, Dolma) gate web documents on the perplexity of a KenLM
n-gram model: text that a language model of "good" text finds likely is
kept, gibberish / boilerplate scores badly.  No KenLM binary exists in
this container, and true log-probabilities are transcendental floats
that do not survive a cross-engine value-hash — so this engine keeps
the SHAPE of the filter but replaces log p with an integer proxy:

    score(doc) = Σ_g floor(log2(1 + count_model(g))) / |grams(doc)|

where ``count_model`` is the word-bigram count over the corpus' train
split (the deterministic hash split of `operators/sampling.py`, the
same stand-in the decontamination operator uses for its eval set).
``floor(log2(1+c))`` is ``length(bin(1+c)) - 1`` — pure integer
arithmetic available verbatim in Spark AND DuckDB, monotone in the
count, with the log damping that makes LM scores robust to a handful
of ultra-frequent grams.  Out-of-vocabulary grams contribute 0, like a
floored backoff.  The result ranks documents the way a unigram/bigram
KenLM would to first order, and is bit-identical across engines.

Scale (100 TB): the model build is one partial-aggregated groupBy over
the train split's bigrams, capped to the ``max_vocab`` most frequent
grams (deterministic count-then-hash order) exactly as production
KenLM models prune their vocab.  The capped model is then a BROADCAST
join against the scoring side — the corpus streams map-side past a
≤max_vocab hash table, one per-doc aggregation, no corpus-side shuffle
of gram rows except that final doc_id agg.  With the cap removed the
join degrades gracefully to sort-merge on the gram hash.

Reference parity: none (the reference has no corpus operators); the
north-star text family's model-based rung next to tf-idf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import SQL_TOKENS, word_shingles
from export_oltp_to_olap_spark.operators.partitioning import spread_for_compute
from export_oltp_to_olap_spark.operators.sampling import _BUCKETS, assign_splits

FIXTURE_N = 2  # word bigrams: the synthetic docs are too short for 5-grams
MAX_VOCAB = 262_144


def _doc_grams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, g) — one row per gram occurrence, md5-keyed (fixed width)."""
    return (
        spread_for_compute(docs.select(id_col, text_col), id_col)
        .select(F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram"))
        .select(id_col, F.md5("gram").alias("g"))
    )


def train_gram_model(
    train_docs: DataFrame,
    n: int = FIXTURE_N,
    max_vocab: int = MAX_VOCAB,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(g, cnt)`` — gram counts over the model corpus, pruned to the
    ``max_vocab`` most frequent (ties broken by gram hash so the cut is
    deterministic in both engines)."""
    counts = (
        _doc_grams(train_docs, n, id_col, text_col)
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return counts.orderBy(F.col("cnt").desc(), "g").limit(max_vocab)


def lm_score_docs(
    docs: DataFrame,
    model: DataFrame,
    n: int = FIXTURE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document fluency score against ``model``.

    Returns ``(doc_id, n_grams, lm_hits, score)`` for every doc with at
    least one n-gram: ``lm_hits`` = grams found in the model vocab,
    ``score`` = mean integer log2 bucket (6-dp round of an int/int
    division — engine-exact)."""
    bucket = (F.length(F.bin(F.coalesce(F.col("cnt"), F.lit(0)) + 1)) - 1).cast("long")
    scored = (
        _doc_grams(docs, n, id_col, text_col)
        .join(F.broadcast(model), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count("cnt").cast("long").alias("lm_hits"),
            F.sum(bucket).cast("long").alias("bucket_sum"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_grams",
        "lm_hits",
        F.round(F.col("bucket_sum") / F.col("n_grams"), 6).alias("score"),
    ).orderBy(id_col)


def lm_fluency_scores(docs: DataFrame, n: int = FIXTURE_N) -> DataFrame:
    """Fixture-shaped entry: model trained on the deterministic ``train``
    split, every document scored against it (self-scoring the train
    split is how CCNet buckets its own corpus into quality tiers)."""
    assigned = assign_splits(docs, "doc_id")
    train = assigned.where(F.col("split") == "train").drop("split")
    return lm_score_docs(docs, train_gram_model(train, n), n)


_TRAIN_BOUND = int(0.8 * _BUCKETS)


def lm_fluency_sql(n: int = FIXTURE_N, max_vocab: int = MAX_VOCAB) -> str:
    """DuckDB restatement of `lm_fluency_scores` at the same n/cap."""
    toks = SQL_TOKENS.format(t="text")
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
           AS bucket,
         {toks} AS t
  FROM documents
),
doc_grams AS (
  SELECT doc_id, bucket,
         md5(array_to_string(t[i:i+{n - 1}], ' ')) AS g
  FROM base, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS u(i)
),
model AS (
  SELECT g, CAST(count(*) AS BIGINT) AS cnt
  FROM doc_grams WHERE bucket < {_TRAIN_BOUND}
  GROUP BY g
  ORDER BY cnt DESC, g
  LIMIT {max_vocab}
),
scored AS (
  SELECT d.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(m.cnt) AS BIGINT) AS lm_hits,
         CAST(sum(length(bin(coalesce(m.cnt, 0) + 1)) - 1) AS BIGINT) AS bucket_sum
  FROM doc_grams d LEFT JOIN model m USING (g)
  GROUP BY d.doc_id
)
SELECT doc_id, n_grams, lm_hits,
       round(bucket_sum / n_grams, 6) AS score
FROM scored
ORDER BY doc_id
"""


LM_FLUENCY_SQL = lm_fluency_sql(FIXTURE_N, MAX_VOCAB)
