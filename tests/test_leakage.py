"""Near-dup split-leakage: the report must count straddling pairs
exactly, and the cluster-keyed assignment must make them impossible."""

from __future__ import annotations

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.neardup import (
    minhash_lsh_neardup,
    minhash_neardup_clusters,
)
from export_oltp_to_olap_spark.operators.sampling import assign_splits
from export_oltp_to_olap_spark.plans.leakage import (
    leakage_safe_split_summary,
    split_leakage_report,
)


def test_report_counts_match_direct_pair_labeling(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    report = {
        (r.split_a, r.split_b): r.n_pairs
        for r in split_leakage_report(docs).collect()
    }
    # recount independently: label each pair end with its split
    sp = {r.doc_id: r.split for r in assign_splits(docs.select("doc_id"), "doc_id").collect()}
    expect: dict[tuple[str, str], int] = {}
    for r in minhash_lsh_neardup(docs).collect():
        key = tuple(sorted((sp[r.doc_a], sp[r.doc_b])))
        expect[key] = expect.get(key, 0) + 1
    assert report == expect
    assert sum(report.values()) > 0, "no near-dup pairs at sf0.01 — fixture drifted"


def test_cluster_keyed_assignment_has_zero_cross_split_pairs(spark, sf001):
    """The fix's contract: keying splits on canonical_id makes every
    near-dup pair co-located — zero off-diagonal pairs, by construction,
    re-verified against the actual pair list."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    assigned = assign_splits(minhash_neardup_clusters(docs), "canonical_id")
    sp = {r.doc_id: r.split for r in assigned.collect()}
    for r in minhash_lsh_neardup(docs).collect():
        assert sp[r.doc_a] == sp[r.doc_b], f"pair {r.doc_a},{r.doc_b} straddles splits"

    # the summary reconciles with the assignment it reports on
    summary = {r.split: (r.n_docs, r.n_clusters) for r in leakage_safe_split_summary(docs).collect()}
    from collections import Counter

    docs_per_split = Counter(sp.values())
    assert {s: c[0] for s, c in summary.items()} == dict(docs_per_split)
    assert sum(c[1] for c in summary.values()) == len(
        {r.canonical_id for r in assigned.collect()}
    )
