"""Round-11 face contracts beyond the shared oracle diff: conservation
laws for the spectra, boundedness for the vocabulary overlap, and the
recall⊇confirm containment of the hybrid near-dup audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.plans import text_queries
from export_oltp_to_olap_spark.sources.parquet import load_tables


def _docs(spark, sf001):
    return load_tables(spark, sf001, ("documents",))["documents"]


def test_zipf_spectrum_conserves_tokens_and_terms(spark, sf001):
    """Σ n_occurrences over buckets = total corpus tokens per source
    (every token lands in exactly one (term, bucket)); Σ n_terms =
    per-source distinct-term count; bucket_low = 2^bucket."""
    docs = _docs(spark, sf001)
    spec = text_queries.token_zipf_spectrum(docs).collect()
    from export_oltp_to_olap_spark.functions.text import tokens

    want = {
        (r["source"]): (r["n_tok"], r["n_terms"])
        for r in docs.select(
            "source", F.explode(tokens("text")).alias("tok")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tok"),
            F.countDistinct("tok").alias("n_terms"),
        )
        .collect()
    }
    by_src = {}
    for r in spec:
        assert r["bucket_low"] == 2 ** r["freq_bucket"]
        assert r["bucket_low"] <= r["n_occurrences"]  # cnt >= bucket_low each term
        occ, terms = by_src.get(r["source"], (0, 0))
        by_src[r["source"]] = (occ + r["n_occurrences"], terms + r["n_terms"])
    assert by_src == want


def test_doc_length_spectrum_conserves_docs_and_tokens(spark, sf001):
    docs = _docs(spark, sf001)
    spec = text_queries.doc_length_spectrum(docs).collect()
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in spec) == n_docs
    # every doc's tokens land in its bucket: totals must match the
    # independent per-source sum
    from export_oltp_to_olap_spark.functions.text import tokens

    want = {
        r["source"]: r["t"]
        for r in docs.select("source", F.size(tokens("text")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("t"))
        .collect()
    }
    got = {}
    for r in spec:
        got[r["source"]] = got.get(r["source"], 0) + r["n_tokens"]
        if r["len_bucket"] >= 0:
            assert r["bucket_low"] == 2 ** r["len_bucket"]
            assert r["n_tokens"] >= r["n_docs"] * r["bucket_low"]
        else:
            assert r["bucket_low"] == 0 and r["n_tokens"] == 0
    assert got == want


def test_doc_length_spectrum_buckets_zero_token_docs(spark):
    df = spark.createDataFrame(
        [(1, "...", "a"), (2, "one two", "a"), (3, "", "b")],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source"], r["len_bucket"]): r
        for r in text_queries.doc_length_spectrum(df).collect()
    }
    assert rows[("a", -1)]["n_docs"] == 1  # punctuation-only doc
    assert rows[("a", 1)]["n_docs"] == 1  # 2 tokens -> bucket 1
    assert rows[("b", -1)]["n_docs"] == 1  # empty doc


def test_vocab_overlap_bounded_and_symmetric_input_order(spark, sf001):
    """n_common ≤ k; pairs are canonically ordered; and the overlap of a
    source with itself never appears."""
    docs = _docs(spark, sf001)
    k = 10
    rows = text_queries.source_vocab_overlap(docs, k=k).collect()
    assert rows, "fixture sources share head vocabulary"
    for r in rows:
        assert 1 <= r["n_common"] <= k
        assert r["source_a"] < r["source_b"]


def test_vocab_overlap_detects_planted_disjoint_source(spark):
    """A source with a disjoint vocabulary overlaps nobody; two sources
    sharing their full head vocabulary overlap at k."""
    rows = []
    for i in range(30):
        rows.append((i, " ".join(f"w{j}" for j in range(20)), "s_a"))
        rows.append((100 + i, " ".join(f"w{j}" for j in range(20)), "s_b"))
        rows.append((200 + i, " ".join(f"z{j}" for j in range(20)), "s_z"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r["n_common"]
        for r in text_queries.source_vocab_overlap(df, k=15).collect()
    }
    assert got == {("s_a", "s_b"): 15}


def test_hybrid_confirm_pairs_are_exactly_the_lexical_candidates(spark, sf001):
    """The hybrid face never invents or drops a pair: its pair set IS
    ngram_jaccard_pairs at the recall threshold (the cosine only sets
    the boolean), and confirmed rows are the pairs whose exact cosine
    clears the knob."""
    from export_oltp_to_olap_spark.operators import neardup, similarity

    docs = _docs(spark, sf001)
    emb = load_tables(spark, sf001, ("embeddings",))["embeddings"]
    out = neardup.hybrid_neardup_confirm(docs, emb).collect()
    lex = {
        (r["doc_a"], r["doc_b"])
        for r in neardup.ngram_jaccard_pairs(
            docs, 3, neardup.HYBRID_JACCARD_T
        ).collect()
    }
    assert {(r["doc_a"], r["doc_b"]) for r in out} == lex
    confirmed = {(r["doc_a"], r["doc_b"]) for r in out if r["cos_confirmed"]}
    cos = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.cosine_neardup(
            emb, threshold=neardup.HYBRID_COS_T
        ).collect()
    }
    assert confirmed == lex & cos


def test_cli_corpus_stats_persists_all_three_tables(spark, sf001, tmp_path, capsys):
    """`corpus-stats` persists the three data-card tables and each
    matches the registered face's output byte-for-row."""
    import json

    from export_oltp_to_olap_spark.cli import main

    out = str(tmp_path / "stats")
    rc = main(["corpus-stats", "--source-dir", sf001, "--out", out], spark=spark)
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    docs = _docs(spark, sf001)
    for name, fn in (
        ("token_zipf_spectrum", text_queries.token_zipf_spectrum),
        ("doc_length_spectrum", text_queries.doc_length_spectrum),
        ("source_vocab_overlap", text_queries.source_vocab_overlap),
    ):
        persisted = sorted(
            tuple(r) for r in spark.read.parquet(f"{out}/{name}").collect()
        )
        live = sorted(tuple(r) for r in fn(docs).collect())
        assert persisted == live, name
        assert s["rows"][name] == len(live)


def test_doc_length_delta_equals_rebuild_on_any_slicing(spark, sf001):
    """The monoid merge equals a full rebuild for ANY standing/delta
    split, not just the fixture's 90% cut."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf001)
    want = sorted(tuple(r) for r in text_queries.doc_length_spectrum(docs).collect())
    max_id = docs.agg(F.max("doc_id")).first()[0]
    for frac in (0.0, 0.5, 0.97):
        cut = int(frac * max_id)
        standing = docs.where(F.col("doc_id") <= cut)
        delta = docs.where(F.col("doc_id") > cut)
        got = sorted(
            tuple(r)
            for r in text_queries.doc_length_spectrum_delta(
                delta, text_queries._doc_length_counts(standing)
            ).collect()
        )
        assert got == want, frac


def test_spectra_match_python_reference_on_random_corpora(spark):
    """Hypothesis: both spectra equal a pure-Python recount for random
    corpora — including empty docs, repeated tokens, punctuation-only
    text, and multi-source mixes."""
    import math
    import re
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab1", min_size=1, max_size=3)
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    def toks(text):
        return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(
        st.tuples(doc, st.sampled_from(["s1", "s2"])), min_size=1, max_size=15
    ))
    def check(docs):
        rows = [(i, t, s) for i, (t, s) in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")

        # doc-length spectrum
        want_len = Counter()
        want_len_tokens = Counter()
        for _, t, s in rows:
            n = len(toks(t))
            b = -1 if n == 0 else int(math.floor(math.log2(n)))
            want_len[(s, b)] += 1
            want_len_tokens[(s, b)] += n
        got = text_queries.doc_length_spectrum(df).collect()
        assert {(r["source"], r["len_bucket"]): r["n_docs"] for r in got} == dict(want_len)
        assert {(r["source"], r["len_bucket"]): r["n_tokens"] for r in got} == dict(want_len_tokens)

        # zipf spectrum
        per_source = {}
        for _, t, s in rows:
            per_source.setdefault(s, Counter()).update(toks(t))
        want_terms = Counter()
        want_occ = Counter()
        for s, counts in per_source.items():
            for _, c in counts.items():
                b = int(math.floor(math.log2(c)))
                want_terms[(s, b)] += 1
                want_occ[(s, b)] += c
        gz = text_queries.token_zipf_spectrum(df).collect()
        assert {(r["source"], r["freq_bucket"]): r["n_terms"] for r in gz} == dict(want_terms)
        assert {(r["source"], r["freq_bucket"]): r["n_occurrences"] for r in gz} == dict(want_occ)

    check()


def _python_waterfill(rows, budget_tenths, max_epochs_tenths):
    """Pure-Python restatement of capped_epoch_allocation's one-pass
    waterfilling (same proxy order, same boundary predicate, same
    anchor clamp) — integer arithmetic throughout."""
    total = sum(t for _, t, _ in rows)
    B = budget_tenths * total // 10
    base = []
    for s, t, wu in rows:
        cap = max_epochs_tenths * t // 10
        wu = max(wu, 1)
        base.append((cap * 10**12 // wu, s, t, wu, cap))
    base.sort()
    S = len(base)
    tot_cap = sum(b[4] for b in base)
    tot_wu = sum(b[3] for b in base)
    chosen = None
    for p in range(0, S + 1):
        np_ = B - sum(b[4] for b in base[:p])
        dp = tot_wu - sum(b[3] for b in base[:p])
        if np_ < 0:
            continue
        if p >= 1 and not (base[p - 1][3] * np_ >= base[p - 1][4] * dp):
            continue
        if p < S and not (base[p][3] * np_ < base[p][4] * dp):
            continue
        chosen = (p, np_, dp)
        break
    assert chosen is not None, "waterfilling boundary must exist"
    p, np_, dp = chosen
    out = {}
    for i, (_, s, t, wu, cap) in enumerate(base):
        capped = i < p
        target = cap if capped else wu * np_ // dp
        out[s] = [t, cap, capped, target]
    # anchor = largest uncapped source
    uncapped = [(b[2], b[1]) for i, b in enumerate(base) if i >= p]
    if uncapped:
        anchor = sorted(uncapped, key=lambda x: (-x[0], x[1]))[0][1]
        out[anchor][3] += min(B, tot_cap) - sum(v[3] for v in out.values())
    return B, tot_cap, out


@pytest.mark.slow
def test_capped_allocation_matches_python_waterfiller(spark):
    """Hypothesis: the Spark face equals the pure-Python waterfiller for
    random source mixes and knobs, and Σ targets == min(B, Σ caps)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from export_oltp_to_olap_spark.operators.sampling import (
        capped_epoch_allocation,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        sizes=st.lists(st.integers(1, 60), min_size=1, max_size=10),
        budget_tenths=st.integers(1, 80),
        cap_tenths=st.integers(1, 80),
    )
    def check(sizes, budget_tenths, cap_tenths):
        rows = []
        doc = 0
        for s, n in enumerate(sizes):
            for _ in range(n):
                rows.append((doc, f"s{s:02d}", "w " * (3 + doc % 5)))
                doc += 1
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            r["source"]: (
                r["tokens"], r["cap_tokens"], r["capped"], r["target_tokens"]
            )
            for r in capped_epoch_allocation(
                df, budget_tenths=budget_tenths, max_epochs_tenths=cap_tenths
            ).collect()
        }
        # feed the reference the SAME integer weights the face derives
        from export_oltp_to_olap_spark.operators.sampling import mixture_weights

        w = {
            r["source"]: (r["tokens"], int(round(r["weight"] * 1_000_000)))
            for r in mixture_weights(df).collect()
        }
        B, tot_cap, want = _python_waterfill(
            [(s, t, wu) for s, (t, wu) in sorted(w.items())],
            budget_tenths,
            cap_tenths,
        )
        assert {s: tuple(v) for s, v in want.items()} == {
            s: (v[0], v[1], v[2], v[3]) for s, v in got.items()
        }
        assert sum(v[3] for v in got.values()) == min(B, tot_cap)

    check()


def test_cli_plan_mixture_persists_and_summarizes(spark, sf001, tmp_path, capsys):
    import json

    from export_oltp_to_olap_spark.cli import main
    from export_oltp_to_olap_spark.operators.sampling import (
        capped_epoch_allocation,
    )

    out = str(tmp_path / "plan")
    rc = main(["plan-mixture", "--source-dir", sf001, "--out", out], spark=spark)
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    live = capped_epoch_allocation(_docs(spark, sf001)).collect()
    assert s["n_sources"] == len(live)
    assert s["planned_tokens"] == sum(r["target_tokens"] for r in live)
    assert s["n_capped"] == sum(1 for r in live if r["capped"])
    assert 0 < s["n_capped"] < s["n_sources"]  # both branches on fixture
    persisted = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{out}/capped_epoch_allocation").collect()
    )
    assert persisted == sorted(tuple(r) for r in live)


def test_hybrid_recall_threshold_candidates_stay_subquadratic(spark, sf001):
    """The hybrid face's loose 0.5 recall threshold doubles the prefix
    length vs the 0.7 face — candidate volume must still be a small
    fraction of N²/2 (the prefix filter's whole point), or the
    'lexical recall is the cheap stage' claim is false."""
    from export_oltp_to_olap_spark.operators.neardup import (
        HYBRID_JACCARD_T,
        _ngram_prefix_candidates,
        doc_shingle_sets,
    )
    from pyspark.sql import functions as F

    docs = _docs(spark, sf001)
    n = docs.count()
    sets = doc_shingle_sets(docs, 3).where(F.size("shs") > 0)
    sets = sets.withColumn("n_sh", F.size("shs"))
    cands = _ngram_prefix_candidates(sets, HYBRID_JACCARD_T).count()
    # measured 4559 of 124,750 possible pairs (3.7%) on the sf0.001
    # word-salad fixture — a dense-vocabulary WORST case for prefix
    # collisions; 5% is the regression ceiling, ~27x under brute force
    assert cands < 0.05 * n * (n - 1) / 2, (cands, n)
