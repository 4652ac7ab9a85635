"""Property tests for the round-12 primitives over hypothesis-generated
corpora: novelty delta ≡ full profile at arbitrary cuts, and the fuzzy
decontamination gate ≡ the batch face on duplication-heavy corpora."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import decontam
from export_oltp_to_olap_spark.plans import text_queries

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# A tiny vocabulary with heavy reuse, so shingles collide across docs
# often enough for novelty attribution and near-dup pairs to be
# non-vacuous on generated corpora.
_WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])


@st.composite
def _corpus(draw):
    n = draw(st.integers(3, 14))
    rows = []
    for i in range(n):
        if rows and draw(st.booleans()):
            # duplicate (or lightly edit) an earlier doc — the near-dup
            # and zero-novelty cases
            base = draw(st.sampled_from(rows))[1]
            words = base.split()
            if words and draw(st.booleans()):
                words[draw(st.integers(0, len(words) - 1))] = draw(_WORD)
            text = " ".join(words)
        else:
            text = " ".join(draw(st.lists(_WORD, min_size=0, max_size=12)))
        rows.append((i, text))
    return rows


@pytest.mark.slow
def test_novelty_delta_equals_profile_at_any_cut(spark):
    @settings(**_SETTINGS)
    @given(rows=_corpus(), cut_frac=st.sampled_from([0.0, 0.3, 0.7, 1.0]))
    def check(rows, cut_frac):
        docs = spark.createDataFrame(
            [(i, t, f"s{i % 3}") for i, t in rows],
            "doc_id long, text string, source string",
        )
        full = {
            tuple(r) for r in text_queries.source_novelty_profile(docs).collect()
        }
        cut = int(cut_frac * (len(rows) - 1))
        standing = docs.where(F.col("doc_id") <= cut)
        delta = docs.where(F.col("doc_id") > cut)
        merged = {
            tuple(r)
            for r in text_queries.source_novelty_delta(
                delta,
                text_queries.novelty_standing_grams(standing),
                text_queries.novelty_standing_counts(standing),
            ).collect()
        }
        assert merged == full, (rows, cut)

    check()


@pytest.mark.slow
def test_fuzzy_gate_equals_batch_face_on_generated_corpora(spark):
    @settings(**_SETTINGS)
    @given(rows=_corpus())
    def check(rows):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        from export_oltp_to_olap_spark.operators.sampling import assign_splits

        assigned = assign_splits(docs, "doc_id")
        train = assigned.where(F.col("split") == "train").drop("split")
        eval_docs = assigned.where(F.col("split") == "test").drop("split")
        bands, esets = decontam.fuzzy_eval_index(eval_docs)
        got = {
            tuple(r)
            for r in decontam.fuzzy_decontam_at_ingest(train, bands, esets)
            .dropDuplicates(["train_id", "eval_id"])
            .collect()
        }
        want = {
            tuple(r) for r in decontam.fuzzy_decontam_pairs(docs).collect()
        }
        assert got == want, rows

    check()
