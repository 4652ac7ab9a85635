"""Bloom-prefiltered decontamination — the beyond-broadcast eval path.

The contract under test: the prefilter is INVISIBLE in the result (the
exact verify join removes every false positive, so the Bloom face
hash-matches the exact face and shares its oracle), the bitmap cannot
produce false negatives (probe-positive grams are a superset of the
true hits), its footprint is set by the false-positive budget alone
(independent of eval cardinality — the property that makes it the
structure of choice when `MAX_EVAL_GRAMS` no longer fits), and the
measured false-positive rate stays near the textbook estimate.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import decontam


def _docs(spark, sf001):
    return spark.read.parquet(f"{sf001}/documents.parquet")


def _splits(spark, sf001):
    return decontam.train_eval_split(_docs(spark, sf001))


def test_bloom_face_equals_exact_face(spark, sf001):
    exact = decontam.decontaminate_docs(_docs(spark, sf001)).collect()
    bloom = decontam.decontaminate_docs_bloom(_docs(spark, sf001)).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in bloom]


def test_probe_positives_are_superset_of_true_hits(spark, sf001):
    """No false negatives: every train gram that IS in the eval set must
    survive the bitmap probe (same double-hash family both sides)."""
    train, eval_docs = _splits(spark, sf001)
    bm = decontam.eval_gram_bloom(eval_docs)
    n = decontam.FIXTURE_N
    from export_oltp_to_olap_spark.functions.text import word_shingles

    grams = (
        train.select(
            F.explode(F.array_distinct(word_shingles("text", n))).alias("gram")
        )
        .select(
            F.md5("gram").alias("g"),
            *decontam._gram_hash_cols(),
        )
        .toPandas()
    )
    eval_g = {
        r.g for r in decontam.eval_ngram_set(eval_docs, n).collect()
    }
    pos = decontam._bloom_positions(
        grams["h1"].to_numpy(), grams["h2"].to_numpy(), decontam.BLOOM_M_BITS, decontam.BLOOM_K
    )
    bits = np.uint8(1) << (pos & 7).astype("uint8")
    probe_hit = ((bm[pos >> 3] & bits) != 0).all(axis=0)
    true_hit = grams["g"].isin(eval_g).to_numpy()
    assert (probe_hit | ~true_hit).all(), "bloom dropped a true hit (false negative)"
    # and the prefilter is selective: false-positive rate near the
    # textbook (1 - e^{-kn/m})^k — loose 10x envelope, this is a
    # statistical property, not an exact one
    fp = (probe_hit & ~true_hit).sum()
    neg = (~true_hit).sum()
    n_eval = len(eval_g)
    expected = (1 - np.exp(-decontam.BLOOM_K * n_eval / decontam.BLOOM_M_BITS)) ** decontam.BLOOM_K
    assert fp / max(neg, 1) <= max(10 * expected, 1e-4), (fp, neg, expected)


def test_bitmap_footprint_independent_of_eval_size(spark, sf001):
    """The standing structure is m/8 bytes no matter how many grams go
    in — the property the broadcast-array path (MAX_EVAL_GRAMS) lacks."""
    _, eval_docs = _splits(spark, sf001)
    small = decontam.eval_gram_bloom(eval_docs.limit(5), m_bits=1 << 16)
    large = decontam.eval_gram_bloom(eval_docs, m_bits=1 << 16)
    assert len(small) == len(large) == (1 << 16) // 8
    # more grams -> more bits set, never fewer
    assert np.unpackbits(large).sum() >= np.unpackbits(small).sum()


def test_m_bits_must_be_power_of_two():
    with pytest.raises(ValueError):
        decontam._bloom_positions(
            np.array([1], dtype="int64"), np.array([2], dtype="int64"), 1000, 3
        )


def test_prebuilt_bitmap_reuse_matches_inline_build(spark, sf001):
    """The standing-artifact form: build once, hand the (bm, m_bits, k)
    triple to the probe — same rows as letting the operator build it."""
    train, eval_docs = _splits(spark, sf001)
    bm = decontam.eval_gram_bloom(eval_docs)
    triple = (bm, decontam.BLOOM_M_BITS, decontam.BLOOM_K)
    inline = decontam.contamination_hits_bloom(train, eval_docs).collect()
    reused = decontam.contamination_hits_bloom(
        train, eval_docs, bloom=triple
    ).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in reused]


def test_bare_bitmap_is_rejected(spark, sf001):
    """A bare array cannot carry its build-time k; probing a k-mismatched
    bitmap silently MISSES contamination, so the operator only accepts
    the load_eval_bloom triple."""
    train, eval_docs = _splits(spark, sf001)
    bm = decontam.eval_gram_bloom(eval_docs)
    with pytest.raises(TypeError, match="triple"):
        decontam.contamination_hits_bloom(train, eval_docs, bloom=bm)
