"""Property tests: chunking / packing / canonicalization vs pure-Python
models over hypothesis-generated corpora (random token counts, casing,
punctuation, degenerate short/empty docs)."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from export_oltp_to_olap_spark.operators.chunking import (
    chunk_documents,
    pack_assignments,
)
from export_oltp_to_olap_spark.operators.neardup import normalized_dedup_docs

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Texts from a tiny alphabet of tokens plus punctuation/case noise so
# collisions and canonicalization-only duplicates actually occur.
_WORD = st.sampled_from(["alpha", "Beta", "GAMMA", "d9", "x"])
_SEP = st.sampled_from([" ", "  ", ", ", "! ", " - ", "\t"])


@st.composite
def _text(draw):
    words = draw(st.lists(_WORD, min_size=0, max_size=12))
    seps = [draw(_SEP) for _ in words]
    return "".join(w + s for w, s in zip(words, seps))


def _tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_chunking_matches_python_model(spark):
    @settings(**_SETTINGS)
    @given(
        texts=st.lists(_text(), min_size=1, max_size=8),
        chunk=st.integers(min_value=2, max_value=6),
        overlap=st.integers(min_value=0, max_value=4),
    )
    def check(texts, chunk, overlap):
        if overlap >= chunk:
            return
        stride = chunk - overlap
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            (r["doc_id"], r["chunk_index"]): (r["n_tokens"], r["chunk_fp"])
            for r in chunk_documents(docs, chunk=chunk, overlap=overlap).collect()
        }
        want = {}
        for doc_id, text in enumerate(texts):
            toks = _tokens(text)
            if not toks:
                continue
            offsets = list(range(0, max(len(toks) - overlap, 1), stride))
            for i, o in enumerate(offsets):
                piece = toks[o : o + chunk]
                want[(doc_id, i)] = (
                    len(piece),
                    hashlib.md5(" ".join(piece).encode()).hexdigest(),
                )
        assert got == want

    check()


def test_packing_matches_python_prefix_sums(spark):
    @settings(**_SETTINGS)
    @given(
        counts=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=12),
        window=st.integers(min_value=1, max_value=12),
    )
    def check(counts, window):
        rows = [
            (i, " ".join(f"t{j}" for j in range(c)), "s")
            for i, c in enumerate(counts)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            r["doc_id"]: (r["start"], r["bin"])
            for r in pack_assignments(docs, window=window).collect()
        }
        acc = 0
        for i, c in enumerate(counts):
            assert got[i] == (acc, acc // window)
            acc += c

    check()


def test_normalized_dedup_matches_python_grouping(spark):
    @settings(**_SETTINGS)
    @given(texts=st.lists(_text(), min_size=1, max_size=10))
    def check(texts):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["canon_fp"]: (r["keeper_doc_id"], r["n_copies"], r["n_raw_variants"])
            for r in normalized_dedup_docs(docs).collect()
        }
        groups: dict[str, list[tuple[int, str]]] = {}
        for i, t in enumerate(texts):
            canon = " ".join(_tokens(t))
            groups.setdefault(canon, []).append((i, t))
        want = {
            hashlib.md5(canon.encode()).hexdigest(): (
                min(i for i, _ in members),
                len(members),
                len({t for _, t in members}),
            )
            for canon, members in groups.items()
        }
        assert got == want

    check()
