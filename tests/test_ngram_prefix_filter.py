"""Prefix-filtered (AllPairs/PPJoin) n-gram Jaccard ≡ full inverted index.

The registered/benched `ngram_jaccard_pairs` prunes candidate generation
to each doc's shingle prefix; losslessness of that pruning is a theorem
(see its docstring), but this pins it empirically against the
unpruned `ngram_jaccard_pairs_indexed` on real fixture text at two
thresholds, and checks the prefix path actually indexes fewer rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.neardup import (
    doc_shingle_sets,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_indexed,
    shingle_index,
)


def _docs(spark, sf0001):
    return spark.read.parquet(f"{sf0001}/documents.parquet")


def _pairs_set(df):
    return {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in df.collect()
    }


@pytest.mark.parametrize("threshold", [0.7, 0.5])
def test_prefix_filter_matches_full_index(spark, sf0001, threshold):
    docs = _docs(spark, sf0001)
    fast = _pairs_set(ngram_jaccard_pairs(docs, n=3, threshold=threshold))
    full = _pairs_set(ngram_jaccard_pairs_indexed(docs, n=3, threshold=threshold))
    assert fast == full
    assert len(fast) > 0  # fixture corpus must actually exercise the join


def test_prefix_index_is_smaller_than_full_index(spark, sf0001):
    docs = _docs(spark, sf0001)
    full_rows = shingle_index(docs, n=3).count()
    # Rebuild the prefix row count the same way the operator does: each doc
    # contributes |x| - floor(t*|x|) + 1 index rows.
    t = 0.7
    sets = doc_shingle_sets(docs, n=3).where(F.size("shs") > 0)
    pref_rows = (
        sets.select(
            (F.size("shs") - F.floor(F.lit(t) * F.size("shs")) + F.lit(1)).alias("p")
        )
        .agg(F.sum("p"))
        .collect()[0][0]
    )
    # At t=0.7 the prefix index should hold well under half the full rows.
    assert pref_rows < 0.5 * full_rows


def test_threshold_curve_monotone_on_similarity_gradient(spark):
    """The calibration curve's semantics on a corpus with a GRADIENT of
    similarity (the synthetic fixture's near-dups are all ~1.0, so the
    registered face alone can't show the shape): counts must be
    non-increasing in t, each level must equal an independently
    computed pair count, and the drop column counts distinct victims."""
    from export_oltp_to_olap_spark.operators.neardup import (
        neardup_threshold_curve,
        ngram_jaccard_pairs,
    )

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu").split()
    rows = [(0, " ".join(base))]
    # doc k keeps the first 26-2k words and appends 2k fresh ones —
    # jaccard vs doc 0 decays smoothly
    for k in range(1, 6):
        words = base[: 26 - 4 * k] + [f"new{k}w{i}" for i in range(4 * k)]
        rows.append((k, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    curve = {
        r["threshold"]: (r["n_pairs"], r["n_docs_dropped"])
        for r in neardup_threshold_curve(docs).collect()
    }
    assert set(curve) == {0.5, 0.6, 0.7, 0.8, 0.9}
    counts = [curve[t][0] for t in (0.5, 0.6, 0.7, 0.8, 0.9)]
    assert counts == sorted(counts, reverse=True), f"not monotone: {counts}"
    assert counts[0] > counts[-1], "gradient produced a flat curve"
    for t, (n_pairs, n_dropped) in curve.items():
        got = ngram_jaccard_pairs(docs, threshold=t)
        assert n_pairs == got.count()
        assert n_dropped == got.select("doc_b").distinct().count()
