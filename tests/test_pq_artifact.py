"""Committed PQ quantizer artifact: rebuild equivalence + saved-face
contract (`artifacts/pq_codebooks_fixture.json`).

The registered `pq_cosine_topk` / `ivfpq_cosine_topk` faces freeze
their quantizers to the committed artifact (train-once / score-many);
their full result-vs-oracle checks live in test_oracle_correctness.py
like every other oracle-bearing query.  Here: the artifact reproduces
bit-for-bit from the sf0.001 fixture (deterministic sample + in-driver
Lloyd), and the saved faces equal the training path run with the same
arrays."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import pq
from export_oltp_to_olap_spark.sources.parquet import load_tables


@pytest.fixture(scope="module")
def emb001(spark, sf0001):
    return load_tables(spark, sf0001, ("embeddings",))["embeddings"].select(
        "vec_id", "embedding"
    )


def test_committed_artifact_matches_fresh_retrain(spark, emb001):
    """Retraining on the same sf0.001 fixture reproduces the committed
    arrays exactly: the sample is a deterministic TakeOrdered and Lloyd
    runs in-driver on float64, so there is no tolerance to hide behind."""
    art = pq.load_pq_artifact()
    fresh = pq.train_pq_artifact(emb001)
    for key in ("pq_codebooks", "coarse_centroids", "residual_codebooks"):
        assert art[key].tolist() == fresh[key], key
    assert (art["dim"], art["m"], art["ksub"], art["n_centroids"]) == (
        fresh["dim"], fresh["m"], fresh["ksub"], fresh["n_centroids"],
    )


def test_saved_faces_equal_training_path_with_same_arrays(spark, emb001):
    art = pq.load_pq_artifact()
    got = sorted(map(tuple, pq.pq_cosine_topk_saved(emb001).collect()))
    want = sorted(
        map(tuple, pq.pq_cosine_topk(emb001, codebooks=art["pq_codebooks"]).collect())
    )
    assert got == want
    got2 = sorted(map(tuple, pq.ivfpq_cosine_topk_saved(emb001).collect()))
    want2 = sorted(
        map(
            tuple,
            pq.ivfpq_cosine_topk(
                emb001,
                n_centroids=art["n_centroids"],
                coarse_centroids=art["coarse_centroids"],
                codebooks=art["residual_codebooks"],
            ).collect(),
        )
    )
    assert got2 == want2


def test_saved_faces_survive_empty_corpus(spark, emb001):
    empty = emb001.limit(0)
    assert pq.pq_cosine_topk_saved(empty).collect() == []
    assert pq.ivfpq_cosine_topk_saved(empty).collect() == []
