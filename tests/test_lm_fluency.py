"""Semantics tests for the count-based n-gram LM fluency scorer
(`operators/lm.py`) on crafted corpora; cross-engine equality runs via
the registered oracle in tests/test_oracle_correctness.py."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from export_oltp_to_olap_spark.operators.lm import (
    lm_score_docs,
    train_gram_model,
)

_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


def test_frequent_phrasing_outscores_gibberish(spark):
    # Model corpus repeats one phrasing; the on-model doc must outscore
    # the OOV gibberish doc, which scores exactly 0.
    train = _docs(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)],
    )
    model = train_gram_model(train, n=2)
    scored = {
        r["doc_id"]: r
        for r in lm_score_docs(
            _docs(
                spark,
                [
                    (1, "the quick brown fox"),
                    (2, "zxqv wkjh pqrst mnbv"),
                ],
            ),
            model,
            n=2,
        ).collect()
    }
    # Doc 1: 3 bigrams, each with model count 8 → bucket floor(log2(9))=3.
    assert scored[1]["n_grams"] == 3 and scored[1]["lm_hits"] == 3
    assert scored[1]["score"] == 3.0
    assert scored[2]["lm_hits"] == 0 and scored[2]["score"] == 0.0


def test_vocab_cap_keeps_most_frequent_grams(spark):
    # "a a" appears 3x, "b b" 2x, "c c" 1x; cap=2 must keep a/b only.
    train = _docs(spark, [(1, "a a a a b b b c c")])
    model = train_gram_model(train, n=2, max_vocab=2)
    kept = {r["cnt"] for r in model.collect()}
    assert len(kept) == 2 and 1 not in kept


def test_oov_buckets_are_zero_not_negative(spark):
    train = _docs(spark, [(1, "x y z")])
    scored = lm_score_docs(_docs(spark, [(9, "p q r s")]), train_gram_model(train, n=2), n=2)
    row = scored.collect()[0]
    assert row["score"] == 0.0 and row["lm_hits"] == 0


def test_short_docs_have_no_row(spark):
    train = _docs(spark, [(1, "alpha beta gamma")])
    out = lm_score_docs(_docs(spark, [(9, "single")]), train_gram_model(train, n=2), n=2)
    assert out.count() == 0


def test_lm_guided_mixture_upweights_fluent_sources(spark):
    """Two sources with EQUAL token mass: the one whose text the
    reference model finds fluent (on-model phrasing) must get strictly
    more mixture weight than the OOV-gibberish source; weights must sum
    to ~1 and every source must appear."""
    from pyspark.sql.types import StringType, StructField

    from export_oltp_to_olap_spark.operators.lm import lm_guided_mixture

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("source", StringType()),
        ]
    )
    phrase = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    # doc_ids spread so the hash train split (80%) surely contains many
    # fluent docs — the model corpus must learn the phrasing.  Each
    # gibberish doc is UNIQUE (12 tokens, same mass as the phrase):
    # repeated noise would be learned by the model just like the
    # phrasing and the two sources would tie.
    for i in range(40):
        rows.append((i, phrase, "fluent"))
        noise = " ".join(f"zq{i}x{j}" for j in range(12))
        rows.append((100 + i, noise, "gibberish"))
    docs = spark.createDataFrame(rows, schema)
    out = {r["source"]: r for r in lm_guided_mixture(docs).collect()}
    assert set(out) == {"fluent", "gibberish"}
    assert out["fluent"]["tokens"] == out["gibberish"]["tokens"]
    assert out["fluent"]["weight"] > out["gibberish"]["weight"]
    total = sum(r["weight"] for r in out.values())
    assert abs(total - 1.0) < 1e-4, total
