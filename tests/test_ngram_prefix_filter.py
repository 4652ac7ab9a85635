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
