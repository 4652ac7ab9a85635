"""Property tests for the round-10 primitives vs pure-Python models
over hypothesis-generated inputs: the run-length multiplicity fold,
the C4 line/page rules, and the epoch-allocation budget identity."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import max_multiplicity
from export_oltp_to_olap_spark.plans.text_queries import (
    C4_MIN_KEPT_LINES,
    C4_MIN_WORDS_PER_LINE,
    c4_quality_flags,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ELEM = st.sampled_from(["a", "b", "ab", "", "z z", "0"])


def test_max_multiplicity_equals_counter_max(spark):
    @settings(**_SETTINGS)
    @given(arrays=st.lists(st.lists(_ELEM, max_size=24), min_size=1, max_size=10))
    def check(arrays):
        df = spark.createDataFrame(
            list(enumerate(arrays)), "i long, arr array<string>"
        )
        got = {
            r.i: r.m
            for r in df.select(
                "i", max_multiplicity(F.col("arr")).alias("m")
            ).collect()
        }
        for i, arr in enumerate(arrays):
            want = max(Counter(arr).values()) if arr else 0
            assert got[i] == want, (arr, got[i], want)

    check()


_LINE_WORD = st.sampled_from(["the", "cat", "JavaScript", "word", "lorem", "ipsum"])
_LINE_END = st.sampled_from([".", "!", "?", '"', "", " ", "{"])


@st.composite
def _page(draw):
    lines = []
    for _ in range(draw(st.integers(0, 6))):
        words = draw(st.lists(_LINE_WORD, min_size=0, max_size=8))
        lines.append(" ".join(words) + draw(_LINE_END))
    return "\n".join(lines)


def _c4_model(text):
    lines = text.split("\n")
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"]\s*$', l)
        and len([w for w in re.split(r"\s+", l) if w]) >= C4_MIN_WORDS_PER_LINE
        and "javascript" not in l.lower()
    ]
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "n_words": len([w for w in re.split(r"\s+", text) if w]),
        "flag_min_sentences": len(kept) >= C4_MIN_KEPT_LINES,
        "flag_no_lorem": "lorem ipsum" not in text.lower(),
        "flag_no_brace": "{" not in text,
    }


def test_c4_flags_match_python_model(spark):
    @settings(**_SETTINGS)
    @given(pages=st.lists(_page(), min_size=1, max_size=8))
    def check(pages):
        df = spark.createDataFrame(
            list(enumerate(pages)), "doc_id long, text string"
        )
        got = {r.doc_id: r.asDict() for r in c4_quality_flags(df).collect()}
        for i, text in enumerate(pages):
            want = _c4_model(text)
            for k, v in want.items():
                assert got[i][k] == v, (repr(text), k, got[i][k], v)
            assert got[i]["keep"] == (
                want["flag_min_sentences"]
                and want["flag_no_lorem"]
                and want["flag_no_brace"]
            )

    check()


def test_epoch_allocation_budget_identity(spark):
    """Σ target_tokens == floor(budget_tenths·total/10) for ANY source
    composition and budget knob — the remainder clamp's exact law."""
    from export_oltp_to_olap_spark.operators.sampling import epoch_allocation

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        sizes=st.lists(st.integers(1, 40), min_size=1, max_size=12),
        budget_tenths=st.integers(1, 40),
    )
    def check(sizes, budget_tenths):
        rows = []
        doc = 0
        for s, n in enumerate(sizes):
            for _ in range(n):
                rows.append((doc, f"s{s:02d}", "w " * (5 + (doc % 7))))
                doc += 1
        out = epoch_allocation(
            spark.createDataFrame(
                rows, "doc_id long, source string, text string"
            ),
            budget_tenths=budget_tenths,
        ).collect()
        total = sum(r.tokens for r in out)
        assert sum(r.target_tokens for r in out) == budget_tenths * total // 10
        assert all(r.target_tokens >= 0 for r in out)

    check()
