"""Semantics tests for exact duplicated-span detection
(`operators/substring.py`) on crafted inputs: planted shared passages,
intra-doc repeats, overlap merging, and the boundary cases the fixture
corpus can't isolate.  Cross-engine value equality runs in
tests/test_oracle_correctness.py via the registered oracles."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from export_oltp_to_olap_spark.operators.substring import (
    duplicated_spans,
    span_dedup_report,
    strip_duplicated_spans,
)

_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


_PASSAGE = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens


def test_planted_shared_passage_found_in_both_docs(spark):
    docs = _docs(
        spark,
        [
            (1, f"unique opening words here {_PASSAGE} and a unique tail one"),
            (2, f"different preamble tokens now {_PASSAGE} then другой ending two"),
            (3, "totally unrelated text with no duplicated passage at all yes"),
        ],
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(docs, n=8).collect()
    }
    # Passage starts at token 5 in doc 1 and doc 2 (4 preamble tokens each).
    assert spans == {1: (5, 12, 8), 2: (5, 12, 8)}


def test_intra_document_repeat_counts_as_duplicated(spark):
    docs = _docs(
        spark,
        [(1, f"{_PASSAGE} filler middle words go here {_PASSAGE}")],
    )
    spans = [
        (r["span_start"], r["span_end"]) for r in duplicated_spans(docs, n=8).collect()
    ]
    assert spans == [(1, 8), (14, 21)]


def test_overlapping_windows_merge_into_one_maximal_span(spark):
    # A 12-token shared passage yields 5 overlapping 8-gram seed
    # positions in each doc; they must merge into ONE span of 12 tokens.
    passage = _PASSAGE + " india juliett kilo lima"
    docs = _docs(
        spark,
        [
            (1, f"{passage} trailing unique words first"),
            (2, f"{passage} other unique trailer second"),
        ],
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(docs, n=8).collect()
    }
    assert spans == {1: (1, 12, 12), 2: (1, 12, 12)}


def test_disjoint_duplicated_passages_stay_separate_spans(spark):
    other = "november oscar papa quebec romeo sierra tango uniform"  # 8 tokens
    gap = "one two three four five six seven eight nine ten"  # 10 tokens > n
    docs = _docs(
        spark,
        [
            (1, f"{_PASSAGE} {gap} {other}"),
            (2, f"{other} some unrelated middle padding words here now {_PASSAGE}"),
        ],
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, n=8).collect()
    )
    # Doc 1: passage at 1-8, other at 19-26 (10-token gap keeps them
    # apart); doc 2 has 7 filler tokens, so its passage sits at 16-23.
    assert spans == [(1, 1, 8), (1, 19, 26), (2, 1, 8), (2, 16, 23)]


def test_short_and_unique_docs_yield_no_spans(spark):
    docs = _docs(
        spark,
        [
            (1, "short doc"),  # < n tokens: no grams at all
            (2, "a perfectly unique document with no twin anywhere around"),
        ],
    )
    assert duplicated_spans(docs, n=8).count() == 0


def test_strip_removes_noncanonical_copies_only(spark):
    """The rewrite contract: the duplicated passage survives in its
    lowest-id carrier and is cut from every other carrier; untouched
    docs pass through verbatim (normalized)."""
    docs = _docs(
        spark,
        [
            (1, f"unique opening words here {_PASSAGE} and a unique tail one"),
            (2, f"different preamble tokens now {_PASSAGE} then ending two"),
            (3, "totally unrelated text with no duplicated passage at all yes"),
        ],
    )
    out = {r["doc_id"]: r for r in strip_duplicated_spans(docs, n=8).collect()}
    assert out[1]["removed_tokens"] == 0
    assert out[1]["clean_text"] == (
        f"unique opening words here {_PASSAGE} and a unique tail one"
    )
    assert out[2]["removed_tokens"] == 8
    assert out[2]["clean_text"] == "different preamble tokens now then ending two"
    assert out[3]["removed_tokens"] == 0
    for r in out.values():
        assert r["kept_tokens"] + r["removed_tokens"] == r["n_tokens"]
        assert r["kept_tokens"] == len(r["clean_text"].split())


def test_strip_canonical_doc_keeps_intra_doc_repeats(spark):
    """Documented trade: repeats INSIDE the canonical carrier survive
    (canonicality is per gram at doc granularity)."""
    docs = _docs(
        spark,
        [
            (1, f"{_PASSAGE} filler middle words go here {_PASSAGE}"),
            (2, f"prefix words {_PASSAGE}"),
        ],
    )
    out = {r["doc_id"]: r for r in strip_duplicated_spans(docs, n=8).collect()}
    assert out[1]["removed_tokens"] == 0  # doc 1 is canonical for the passage
    assert out[2]["clean_text"] == "prefix words"
    assert out[2]["removed_tokens"] == 8


def test_strip_short_doc_passes_through(spark):
    docs = _docs(spark, [(1, "short doc"), (2, "short doc")])
    # both docs are < n tokens: no grams, nothing strippable
    out = {r["doc_id"]: r for r in strip_duplicated_spans(docs, n=8).collect()}
    assert out[1]["clean_text"] == "short doc" and out[1]["removed_tokens"] == 0
    assert out[2]["clean_text"] == "short doc"


def test_strip_merges_overlapping_removal_windows(spark):
    """A 12-token shared passage must come out of the non-canonical doc
    as ONE 12-token cut, not window-by-window fragments."""
    passage = _PASSAGE + " india juliett kilo lima"
    docs = _docs(
        spark,
        [
            (1, f"{passage} trailing unique words first"),
            (2, f"{passage} other unique trailer second"),
        ],
    )
    out = {r["doc_id"]: r for r in strip_duplicated_spans(docs, n=8).collect()}
    assert out[1]["removed_tokens"] == 0
    assert out[2]["removed_tokens"] == 12
    assert out[2]["clean_text"] == "other unique trailer second"


def test_strip_is_idempotent_on_fixture(spark, sf001):
    """One pass removes every non-canonical duplicated window, so a
    second pass over the cleaned corpus must remove ZERO tokens (the
    only surviving repeats are intra-canonical-doc, which strip keeps
    by definition).  Pinned on the real fixture corpus, not a toy."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf001}/documents.parquet").select("doc_id", "text")
    once = strip_duplicated_spans(docs)
    assert once.agg(F.sum("removed_tokens")).first()[0] > 0  # pass 1 bites
    cleaned = once.select("doc_id", F.col("clean_text").alias("text"))
    twice = strip_duplicated_spans(cleaned)
    assert twice.agg(F.sum("removed_tokens")).first()[0] == 0
    # and the text survives a second pass byte-identically
    a = {r["doc_id"]: r["clean_text"] for r in once.collect()}
    b = {r["doc_id"]: r["clean_text"] for r in twice.collect()}
    assert a == b


def test_strip_contaminated_spans_cuts_eval_windows(spark):
    """The decontamination rewrite (same tail, different window source):
    benchmark-quoting passages come out of corpus docs, clean docs pass
    through, and the cut is island-merged."""
    from export_oltp_to_olap_spark.operators.decontam import strip_contaminated_spans

    corpus = _docs(
        spark,
        [
            (1, f"intro words here {_PASSAGE} closing remark now"),
            (2, "a perfectly clean document with zero benchmark overlap"),
        ],
    )
    eval_docs = _docs(spark, [(100, f"benchmark item text {_PASSAGE}")])
    out = {
        r["doc_id"]: r
        for r in strip_contaminated_spans(corpus, eval_docs, n=8).collect()
    }
    assert out[1]["removed_tokens"] == 8
    assert out[1]["clean_text"] == "intro words here closing remark now"
    assert out[2]["removed_tokens"] == 0
    assert out[2]["clean_text"] == (
        "a perfectly clean document with zero benchmark overlap"
    )
    for r in out.values():
        assert r["kept_tokens"] + r["removed_tokens"] == r["n_tokens"]


def test_report_ratio_and_counts(spark):
    docs = _docs(
        spark,
        [
            (1, f"{_PASSAGE} unique tail here making sixteen total tokens yes"),
            (2, f"prefix words {_PASSAGE}"),
        ],
    )
    rep = {r["doc_id"]: r for r in span_dedup_report(docs, n=8).collect()}
    assert rep[1]["n_tokens"] == 16 and rep[1]["n_spans"] == 1
    assert rep[1]["dup_tokens"] == 8 and rep[1]["dup_ratio"] == 0.5
    assert rep[2]["n_tokens"] == 10 and rep[2]["dup_tokens"] == 8
    assert rep[2]["dup_ratio"] == 0.8
