"""Exact-companion ε-checks for the three rows-only sketch queries
(VERDICT r6 item 8): each sketch answer is quantitatively tied to the
exact aggregate its already-oracle-green exact companion computes, so
sketch drift across rounds trips a bound the way RECALL.json catches
ANN drift — instead of resting on the driver's weaker rows-only check.

Bounds are measured, not nominal: the asserted ε is ~2× the worst
observed gap at fixture scale, and each test carries the measurement
in its docstring.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.sources.parquet import load_tables


def test_approx_percentiles_within_eps_of_green_exact_companion(spark, sf001):
    """`approx_percentiles_orders` (GK sketch) vs the oracle-green exact
    query `orders_price_percentiles`: relative ε ≤ 0.02 (measured max
    1.1% at p50 — GK returns an order statistic, the exact percentile
    interpolates between two, so the gap is one inter-value step).  The
    sketch query's own exact columns must equal the green query's values
    bit-for-bit (same function, same rounding) — chaining the in-query
    companion to the oracle."""
    from export_oltp_to_olap_spark.plans.analytic import (
        approx_percentiles_orders,
        orders_price_percentiles,
    )

    tables = load_tables(spark, sf001, ("orders",))
    ap = {r["o_orderpriority"]: r for r in approx_percentiles_orders(tables).collect()}
    ex = {r["o_orderpriority"]: r for r in orders_price_percentiles(tables).collect()}
    assert ap.keys() == ex.keys()
    for prio in ap:
        a, e = ap[prio], ex[prio]
        assert a["exact_p50"] == e["p50"] and a["exact_p99"] == e["p99"], prio
        for sk, exv in (("approx_p50", e["p50"]), ("approx_p99", e["p99"])):
            rel = abs(a[sk] - exv) / exv
            assert rel <= 0.02, f"{prio}/{sk}: {a[sk]} vs exact {exv} (rel {rel:.4f})"


def test_approx_distinct_within_eps_of_exact_companion(spark, sf001):
    """`approx_distinct_parts` (HLL++, rsd 0.05) vs an independently
    computed exact countDistinct — the same exact-distinct operator the
    oracle-green `distinct_agg_orders` exercises: relative ε ≤ 0.15
    (3× the nominal rsd).  The sketch query's in-row `exact_parts`
    companion must equal the independent exact count exactly."""
    from export_oltp_to_olap_spark.plans.analytic import approx_distinct_parts

    tables = load_tables(spark, sf001, ("lineitem",))
    independent = {
        r["l_returnflag"]: r["nd"]
        for r in tables["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("nd"))
        .collect()
    }
    rows = approx_distinct_parts(tables).collect()
    assert {r["l_returnflag"] for r in rows} == independent.keys()
    for r in rows:
        exact = independent[r["l_returnflag"]]
        assert r["exact_parts"] == exact, r["l_returnflag"]
        rel = abs(r["approx_parts"] - exact) / exact
        assert rel <= 0.15, (
            f"{r['l_returnflag']}: approx {r['approx_parts']} vs exact {exact} "
            f"(rel {rel:.4f})"
        )


def test_frequent_terms_sketch_error_bounded_under_pressure(spark, sf001):
    """`frequent_terms_sketch` under GENUINE capacity pressure — the
    regime the fixture documents never reach (~31 distinct terms/source,
    so the suite's other sketch test only pins the exact-within-capacity
    degeneracy).  A deterministic head+tail stream built from lineitem
    (Zipf head h1..h20 carrying ~half the mass + ~2000-term uniform
    tail) gives ~750 distinct terms per source against max_tracked=64,
    and the frequent-items guarantees must hold against exact groupBy
    counts:

    - overestimate-only, additively bounded: 0 ≤ est − exact ≤ ⌈N/cap⌉
      (measured worst over-estimate: +1 vs the ~31 bound);
    - the provably-frequent head is reported (≥3 items/source — exact
      head counts ~480/170/84 all clear the N/cap threshold);
    - no junk: every reported term's exact count is within ⌈N/cap⌉ of
      the true k-th-largest count (it could have been a true top-k
      member under the sketch's error bar).

    The sketch correctly REFUSES to report items it cannot prove
    frequent, so fewer than k rows per source is expected here — that
    refusal (vs hallucinating tail counts) is part of the contract.
    """
    from export_oltp_to_olap_spark.plans.text_queries import frequent_terms_sketch

    k, cap = 8, 64
    li = load_tables(spark, sf001, ("lineitem",))["lineitem"]
    u = (F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(1000003)) + 1) / 1000003.0
    tail = F.pmod(F.xxhash64("l_linenumber", "l_orderkey"), F.lit(2000))
    term = F.when(
        u < 0.5,
        F.concat(F.lit("h"), F.least(F.floor(0.5 / u), F.lit(20)).cast("long").cast("string")),
    ).otherwise(F.concat(F.lit("x"), tail.cast("string")))
    docs = li.select(F.col("l_returnflag").alias("source"), term.alias("text"))

    truth: dict[str, Counter] = {}
    for r in docs.groupBy("source", F.col("text").alias("term")).count().collect():
        truth.setdefault(r["source"], Counter())[r["term"]] = r["count"]
    for source, counts in truth.items():
        assert len(counts) > 5 * cap, (
            f"{source}: only {len(counts)} distinct terms — no capacity "
            "pressure; the sketch would be exact and this test vacuous"
        )

    got: dict[str, list] = {}
    for r in frequent_terms_sketch(docs, k=k, max_tracked=cap).collect():
        got.setdefault(r["source"], []).append((r["term"], r["est_count"]))

    for source, counts in truth.items():
        err = math.ceil(sum(counts.values()) / cap)
        reported = got.get(source, [])
        assert len(reported) >= 3, f"{source}: frequent head not reported"
        kth = sorted(counts.values(), reverse=True)[k - 1]
        for term_, est in reported:
            exact = counts[term_]
            assert 0 <= est - exact <= err, (
                f"{source}/{term_}: est {est} vs exact {exact} (bound {err})"
            )
            assert exact >= kth - err, (
                f"{source}/{term_}: exact {exact} not plausibly top-{k} "
                f"(kth {kth}, bound {err})"
            )
