"""approx_top_k heavy hitters: exact within sketch capacity, bounded
output, deterministic presentation order."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import tokens
from export_oltp_to_olap_spark.plans.text_queries import frequent_terms_sketch
from export_oltp_to_olap_spark.sources.parquet import load_tables


def _docs(spark, sf001):
    return load_tables(spark, sf001, ("documents",))["documents"]


def test_sketch_exact_within_capacity(spark, sf001):
    """With max_tracked above the per-source distinct-term count, the
    sketch degenerates to exact counting: every reported (term, count)
    must equal the true count, and the reported set must be a true top-k
    set (ties at the boundary may swap WHICH tied term appears, so the
    check is count-multiset equality, not term identity)."""
    docs = _docs(spark, sf001)
    got = frequent_terms_sketch(docs, k=10).collect()
    truth: dict[str, Counter] = {}
    for r in docs.select("source", F.explode(tokens("text")).alias("t")).collect():
        if r["t"]:
            truth.setdefault(r["source"], Counter())[r["t"]] += 1
    by_source: dict[str, list] = {}
    for r in got:
        by_source.setdefault(r["source"], []).append((r["term"], r["est_count"]))
    assert set(by_source) == set(truth)
    for source, pairs in by_source.items():
        exact = truth[source]
        for term, est in pairs:
            assert est == exact[term], f"{source}/{term}: {est} != {exact[term]}"
        want_counts = sorted(exact.values(), reverse=True)[: len(pairs)]
        assert sorted((c for _, c in pairs), reverse=True) == want_counts
        assert len(pairs) <= 10


def test_sketch_rows_ordered_for_presentation(spark, sf001):
    rows = frequent_terms_sketch(_docs(spark, sf001), k=5).collect()
    keys = [(r["source"], -r["est_count"], r["term"]) for r in rows]
    assert keys == sorted(keys)
