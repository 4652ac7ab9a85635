"""Committed BPE merge artifact: rebuild equivalence + saved-face
contract (`artifacts/bpe_merges_fixture.json`).

The registered `bpe_tokens_saved` face applies the committed merge list
(train-once / apply-many, the GPT-2 merges.txt convention); its full
result-vs-oracle check lives in test_oracle_correctness.py like every
other oracle-bearing query.  Here: the merges reproduce bit-for-bit
from the sf0.001 fixture (deterministic tie-breaks, no tolerance), the
committed word map equals `segment_word` replayed over the committed
merges, and the map covers the fixture vocabulary at every scale — the
condition under which the oracle's VALUES join is exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import tokens
from export_oltp_to_olap_spark.operators import bpe


@pytest.fixture(scope="module")
def docs001(spark, sf0001):
    return spark.read.parquet(f"{sf0001}/documents.parquet")


def test_committed_merges_match_fresh_retrain(docs001):
    art = bpe.load_bpe_artifact()
    fresh = bpe.train_bpe(
        docs001, num_merges=art["num_merges"], max_words=art["max_words"]
    )
    assert art["merges"] == fresh


def test_committed_vocab_is_segment_word_over_committed_merges():
    art = bpe.load_bpe_artifact()
    ranks = {pair: i for i, pair in enumerate(art["merges"])}
    for word, n in art["vocab"].items():
        assert n == len(bpe.segment_word(word, ranks)), word


def test_committed_vocab_covers_fixture_corpus(spark, docs001, sf001):
    """Every distinct word at both pytest fixture scales is in the
    committed map — so the oracle's length+1 OOV fallback never fires
    and the VALUES join is exact (the artifact was built over the
    union of sf0.001/sf0.01/sf0.1 vocabularies; the synthetic corpus
    draws from one fixed pool)."""
    vocab = set(bpe.load_bpe_artifact()["vocab"])
    for frame in (docs001, spark.read.parquet(f"{sf001}/documents.parquet")):
        words = {
            r.word
            for r in frame.select(
                F.explode(tokens("text")).alias("word")
            ).distinct().collect()
        }
        assert words <= vocab, sorted(words - vocab)[:10]


def test_saved_face_equals_inline_training_at_fixture_settings(docs001):
    """At the artifact's own training settings the apply-only face and
    the train-per-invocation face agree column-for-column (modulo the
    merge-count column name, which records applied vs learned)."""
    saved = {
        r.source: (r.n_docs, r.n_words, r.n_subtokens)
        for r in bpe.bpe_tokens_saved(docs001).collect()
    }
    inline = {
        r.source: (r.n_docs, r.n_words, r.n_subtokens)
        for r in bpe.bpe_token_stats(docs001).collect()
    }
    assert saved == inline


def test_tokenless_docs_count_in_n_docs_in_both_engines(spark, tmp_path):
    """ADVICE r9: a doc whose text tokenizes to nothing (empty or
    punctuation-only) must land in ``n_docs`` in BOTH engines.  Spark
    keeps it via ``explode_outer`` (one NULL-word row); the oracle
    unnests ``[NULL]`` for an empty token list — a plain ``unnest``
    would drop the doc and hash-diverge on such corpora."""
    import duckdb

    rows = [
        (1, "the cat sat", "web"),
        (2, "", "web"),              # empty text → zero tokens
        (3, "?!... ---", "web"),     # punctuation-only → zero tokens
        (4, "cat cat", "books"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.source: (r.n_docs, r.n_words)
        for r in bpe.bpe_tokens_saved(docs).collect()
    }
    assert got["web"] == (3, 3)      # all three docs counted, 3 real words
    assert got["books"] == (1, 2)

    pq = str(tmp_path / "documents.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(bpe.bpe_tokens_saved_sql()).fetchall()
    }
    assert oracle == got
