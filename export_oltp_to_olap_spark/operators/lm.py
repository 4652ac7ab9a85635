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


# ---------------------------------------------------------------------------
# Model-signal-guided mixture weights (DoReMi-flavored)
# ---------------------------------------------------------------------------


def lm_guided_mixture(docs: DataFrame, n: int = FIXTURE_N) -> DataFrame:
    """Per-source mixture weights guided by the reference-LM signal:
    w_s ∝ √tokens_s · fluency_s — the size-α recipe
    (`sampling.mixture_weights`) with each source's mass modulated by
    how fluent the reference n-gram LM finds its text.  This is the
    one-step, closed-form cousin of DoReMi (arXiv:2305.10429): where
    DoReMi iterates a proxy-model excess-loss reweighting, production
    mix planning routinely starts from exactly this — size-damped
    shares times a model-quality factor — and both inputs already
    exist here as audited operators.

    ``fluency_s`` is the corpus-level mean log2-count bucket of the
    source's grams against the train-split model:
    round(Σ bucket_sum / Σ n_grams, 6) — an integer/integer division,
    engine-exact (sources with zero grams get fluency 0 and weight 0).
    √tokens is IEEE-correctly-rounded in both engines; the
    normalization denominator is DECIMAL-summed — the same determinism
    ledger as `mixture_weights`.

    Output (source, tokens, fluency, weight) ordered by source.  Scale:
    the gram-join is the same one big stage as `lm_fluency_scores`
    (broadcast model, partial-aggregated), plus arithmetic on S rows.
    """
    from export_oltp_to_olap_spark.functions.text import token_count
    from export_oltp_to_olap_spark.operators.partitioning import spread_for_compute

    assigned = assign_splits(docs, "doc_id")
    train = assigned.where(F.col("split") == "train").drop("split")
    model = train_gram_model(train, n)
    bucket = (F.length(F.bin(F.coalesce(F.col("cnt"), F.lit(0)) + 1)) - 1).cast("long")
    per_doc = (
        _doc_grams(docs, n, "doc_id", "text")
        .join(F.broadcast(model), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(bucket).cast("long").alias("bucket_sum"),
        )
    )
    per_source_fluency = (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_grams").cast("long").alias("tot_grams"),
            F.sum("bucket_sum").cast("long").alias("tot_buckets"),
        )
    )
    tokens = (
        spread_for_compute(docs.select("source", "text"), "source")
        .select("source", token_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("tokens"))
    )
    raw = (
        tokens.join(per_source_fluency, "source", "left")
        .select(
            "source",
            "tokens",
            F.coalesce(
                F.round(F.col("tot_buckets") / F.col("tot_grams"), 6), F.lit(0.0)
            ).alias("fluency"),
        )
        .withColumn(
            "raw",
            F.round(F.sqrt(F.col("tokens").cast("double")) * F.col("fluency"), 6),
        )
    )
    totals = raw.agg(F.sum(F.col("raw").cast("decimal(28,10)")).alias("raw_total"))
    return (
        raw.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "tokens",
            "fluency",
            F.round(F.col("raw") / F.col("raw_total").cast("double"), 6).alias(
                "weight"
            ),
        )
        .orderBy("source")
    )


def lm_guided_mixture_sql(n: int = FIXTURE_N, max_vocab: int = MAX_VOCAB) -> str:
    """DuckDB restatement of :func:`lm_guided_mixture` — the LM-model
    CTEs from `lm_fluency_sql` carried to a per-source aggregate, then
    the `mixture_weights` determinism ledger (√ · 6-dp rounds · DECIMAL
    denominator)."""
    toks = SQL_TOKENS.format(t="text")
    return f"""
WITH base AS (
  SELECT doc_id, source,
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
per_doc AS (
  SELECT d.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(length(bin(coalesce(m.cnt, 0) + 1)) - 1) AS BIGINT) AS bucket_sum
  FROM doc_grams d LEFT JOIN model m USING (g)
  GROUP BY d.doc_id
),
per_source_fluency AS (
  SELECT b.source,
         CAST(SUM(p.n_grams) AS BIGINT) AS tot_grams,
         CAST(SUM(p.bucket_sum) AS BIGINT) AS tot_buckets
  FROM per_doc p JOIN (SELECT DISTINCT doc_id, source FROM base) b USING (doc_id)
  GROUP BY b.source
),
tokens AS (
  SELECT source, CAST(SUM(len(t)) AS BIGINT) AS tokens FROM base GROUP BY source
),
raw AS (
  SELECT t.source, t.tokens,
         coalesce(round(f.tot_buckets / f.tot_grams, 6), 0.0) AS fluency,
         round(sqrt(CAST(t.tokens AS DOUBLE))
               * coalesce(round(f.tot_buckets / f.tot_grams, 6), 0.0), 6) AS raw
  FROM tokens t LEFT JOIN per_source_fluency f USING (source)
),
totals AS (
  SELECT SUM(CAST(raw AS DECIMAL(28,10))) AS raw_total FROM raw
)
SELECT source, tokens, fluency,
       round(raw / CAST(raw_total AS DOUBLE), 6) AS weight
FROM raw, totals
ORDER BY source
"""


LM_GUIDED_MIXTURE_SQL = lm_guided_mixture_sql()


# ---------------------------------------------------------------------------
# Stateless per-row scoring (the streaming-safe form)
# ---------------------------------------------------------------------------


def model_count_arrays(
    train_docs: DataFrame,
    n: int = FIXTURE_N,
    max_vocab: int = MAX_VOCAB,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The gram model as driver-side numpy arrays (sorted int64 xxhash64
    keys + aligned counts) — the broadcastable form `with_fluency_score`
    searches, mirroring `decontam.eval_gram_hashes`.

    Bounded by the same vocab cap as the batch model (≤ max_vocab
    entries ≈ 4 MB at the default); scores agree with `lm_score_docs`
    gram-for-gram whenever the cap doesn't split a count-tie class
    (only the tiebreak hash differs — md5 there, xxhash64 here), and
    the fixture vocab sits far under the cap.
    """
    import numpy as np

    rows = (
        spread_for_compute(train_docs.select(id_col, text_col), id_col)
        .select(F.explode(word_shingles(text_col, n)).alias("gram"))
        .select(F.xxhash64("gram").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "h")
        .limit(max_vocab)
        .collect()
    )
    hashes = np.array([r["h"] for r in rows], dtype="int64")
    counts = np.array([r["cnt"] for r in rows], dtype="int64")
    order = np.argsort(hashes)
    return hashes[order], counts[order]


def with_fluency_score(
    docs: DataFrame,
    model_arrays,
    n: int = FIXTURE_N,
    text_col: str = "text",
    out_col: str = "lm_score",
) -> DataFrame:
    """Append the per-row LM fluency score — STREAMING-SAFE: no joins,
    no shuffle, no state; one vectorized searchsorted per Arrow batch
    against the Spark-broadcast model arrays.  Scores equal
    `lm_score_docs` doc-for-doc (same buckets, same 6-dp mean); docs
    with no n-gram score NULL (they have no row in the batch report)."""
    from pyspark.sql.functions import pandas_udf

    hashes, counts = model_arrays
    bc = docs.sparkSession.sparkContext.broadcast((hashes, counts))

    @pandas_udf("double")
    def score(gram_hashes):
        import numpy as np
        import pandas as pd

        if len(gram_hashes) == 0:
            return pd.Series([], dtype="float64")
        table, cnts = bc.value

        def buckets_of(flat):
            if len(table) == 0:
                c = np.zeros(len(flat), dtype="int64")
            else:
                idx = np.minimum(np.searchsorted(table, flat), len(table) - 1)
                c = np.where(table[idx] == flat, cnts[idx], 0)
            # floor(log2(1+c)) via frexp — exact for ints < 2^53, unlike
            # float log2 which the libm standard doesn't pin at powers
            # of two (the batch side computes length(bin(1+c))-1).
            return np.frexp((c + 1).astype("float64"))[1] - 1
        out = np.full(len(gram_hashes), np.nan)
        lens = gram_hashes.str.len().fillna(0).astype("int64").to_numpy()
        pos = np.nonzero(lens)[0]
        if len(pos):
            flat = np.concatenate(
                [np.asarray(gram_hashes.iloc[i], dtype="int64") for i in pos]
            )
            b = buckets_of(flat)
            bounds = np.cumsum(lens[pos])
            start = 0
            for i, end in zip(pos, bounds):
                s, k = int(b[start:end].sum()), int(end - start)
                # HALF_UP at 6 dp in pure integers (Python round() is
                # banker's; Spark/DuckDB ROUND is HALF_UP).
                out[i] = ((s * 2_000_000 + k) // (2 * k)) / 1e6
                start = end
        return pd.Series(out)

    gram_hashes = F.transform(word_shingles(text_col, n), lambda g: F.xxhash64(g))
    return docs.withColumn(out_col, score(gram_hashes))
