"""DSIR importance contracts: target-distinctive text must outscore
boilerplate and anti-target text; scores are deterministic; empty
target degrades to non-positive importance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import dsir


@pytest.fixture(scope="module")
def corpus(spark):
    # target-ish docs: English markers + a distinctive content word
    # raw-only docs: Spanish markers + their own vocabulary
    # boilerplate: words shared by every doc
    rows = []
    for i in range(20):
        rows.append((i, "the quick spark engine and the shared pipeline", "en", "s", 10))
    for i in range(20, 40):
        rows.append((i, "el motor la tubería que y el shared pipeline", "es", "s", 10))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_target_docs_outscore_anti_target(corpus):
    out = {r["doc_id"]: r for r in dsir.dsir_importance(corpus).collect()}
    en_scores = [out[i]["importance"] for i in range(20)]
    es_scores = [out[i]["importance"] for i in range(20, 40)]
    assert min(en_scores) > max(es_scores)
    assert all(out[i]["keep"] for i in range(20))
    assert not any(out[i]["keep"] for i in range(20, 40))


def test_scores_deterministic_under_repartition(corpus):
    a = sorted(map(tuple, dsir.dsir_importance(corpus).collect()))
    b = sorted(map(tuple, dsir.dsir_importance(corpus.repartition(7)).collect()))
    assert a == b


def test_shared_boilerplate_contributes_zero(spark):
    """A gram with identical target and raw log2 buckets has weight 0:
    a doc made ONLY of such grams scores exactly 0."""
    # 'common' appears once per doc everywhere; with 2 target docs out
    # of 4, bucket(2) != bucket(4) — so instead craft counts where the
    # buckets collide: target count 2 (bucket 1), raw count 3 (bucket 1).
    rows = [
        (0, "the and of common", "en", "s", 5),
        (1, "the and of common", "en", "s", 5),
        (2, "common", "und", "s", 3),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r for r in dsir.dsir_importance(docs).collect()}
    # doc 2 is only 'common': cnt_t=2 (bucket 1), cnt_r=3 (bucket 2)?
    # bin(3+1)=100 → bucket 2; bin(2+1)=11 → bucket 1 → weight -1.
    assert out[2]["importance"] == -1.0
    assert out[0]["importance"] > out[2]["importance"]


def test_empty_target_yields_nonpositive_scores(spark):
    rows = [(i, "el que la de y", "es", "s", 5) for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = dsir.dsir_importance(docs).collect()
    assert len(out) == 5
    assert all(r["importance"] <= 0 and not r["keep"] for r in out)
