"""Mid-round-11 second-wave contracts: the minhash banding-parity pin
(the bug `lsh_recall_audit` exposed), recall-audit invariants on a
planted corpus, hard-negative structural laws, and a pure-Python
recount for the vocabulary band-pass."""

from __future__ import annotations

import hashlib
import re

import duckdb

from export_oltp_to_olap_spark.operators import neardup, similarity
from export_oltp_to_olap_spark.plans import text_queries
from export_oltp_to_olap_spark.sources.parquet import load_tables


def _docs(spark, sf001):
    return load_tables(spark, sf001, ("documents",))["documents"]


def test_minhash_banding_candidate_parity(spark, sf001):
    """REGRESSION PIN for the DuckDB banding fix: the oracle's LSH
    CANDIDATE set must equal Spark's exactly, not just the ≥0.8-verified
    output.  Before the `h // R` fix, DuckDB's `CAST(h / R AS INTEGER)`
    ROUNDED (float division), pairing mh2 with mh1 and leaving bands 0
    and H/R with a NULL key — a silent recall change no verified face
    could see."""
    docs = _docs(spark, sf001).select("doc_id", "text")
    spark_pairs = sorted(
        (r["doc_a"], r["doc_b"])
        for r in neardup.minhash_candidate_pairs(docs).collect()
    )
    con = duckdb.connect()
    con.register("documents_arrow", docs.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_arrow")
    # everything up to (not including) the candidates CTE, then the
    # candidate join alone — no sizes/verify stages
    prefix = neardup._MINHASH_PAIRS_CTES.split("candidates AS")[0].rstrip().rstrip(",")
    sql = (
        "WITH "
        + prefix
        + """,
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b
    ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b FROM candidates
"""
    )
    duck_pairs = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_pairs == duck_pairs


def test_lsh_recall_audit_planted(spark):
    """Planted corpus: identical twins (Jaccard 1.0 → identical
    signatures → candidate with certainty) land in band 10 with recall
    1; the unrelated doc produces no truth pair; the wasted row's two
    counts agree by construction."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (1, base),
        (2, base),  # identical twin: jaccard 1.0
        (3, base.replace("kappa", "zzz")),  # near twin
        (4, "one two three four five six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["band"]: r for r in neardup.lsh_recall_audit(docs).collect()}
    assert 10 in out, out
    assert out[10]["n_pairs"] == out[10]["n_recalled"] == 1
    for band, r in out.items():
        assert r["n_recalled"] <= r["n_pairs"]
        if band >= 0:
            assert 5 <= band <= 10
        else:
            assert r["n_pairs"] == r["n_recalled"]  # all candidates


def test_hard_negative_structure(spark, sf001):
    """Every mined negative has a different label; each anchor emits
    exactly k rows ranked 1..k (the fixture has ≥k cross-label vectors
    for every anchor); no anchor pairs with itself."""
    emb = load_tables(spark, sf001, ("embeddings",))["embeddings"]
    rows = similarity.hard_negative_mining(emb).collect()
    k = similarity.HARD_NEG_K
    per_anchor: dict[int, list[int]] = {}
    for r in rows:
        assert r["label"] != r["neg_label"]
        assert r["vec_id"] != r["neg_id"]
        per_anchor.setdefault(r["vec_id"], []).append(r["rank"])
    n_vec = emb.count()
    assert len(per_anchor) == n_vec
    for ranks in per_anchor.values():
        assert sorted(ranks) == list(range(1, k + 1))


def test_vocab_prune_pure_python_recount(spark, sf001):
    """Full-row recount of the df band-pass in pure Python: tokenize,
    df over distinct docs, integer band predicates, in-order kept
    fingerprint — byte-identical to the Spark face."""
    docs = _docs(spark, sf001)
    pdf = docs.select("doc_id", "text").toPandas()
    tok_re = re.compile(r"[^a-z0-9]+")
    toks = {
        int(r.doc_id): [t for t in tok_re.split(r.text.lower()) if t]
        for r in pdf.itertuples()
    }
    n_docs = len(toks)
    df_counts: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df_counts[t] = df_counts.get(t, 0) + 1
    lo, hi = text_queries.VOCAB_PRUNE_LO_PCT, text_queries.VOCAB_PRUNE_HI_PCT

    def cls(t: str) -> int:
        d = df_counts[t]
        if d * 100 < lo * n_docs:
            return -1
        if d * 100 > hi * n_docs:
            return 1
        return 0

    want = {}
    for doc_id, ts in toks.items():
        kept = [t for t in ts if cls(t) == 0]
        want[doc_id] = (
            len(ts),
            len(kept),
            sum(1 for t in ts if cls(t) == -1),
            sum(1 for t in ts if cls(t) == 1),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_kept"],
            r["n_pruned_low"],
            r["n_pruned_high"],
            r["kept_fp"],
        )
        for r in text_queries.vocab_prune_rewrite(docs).collect()
    }
    assert got == want
    # the fixture must exercise all three classes or the face proves
    # nothing — pin non-degeneracy, not just agreement
    assert any(v[2] > 0 for v in want.values()), "no pruned-low tokens"
    assert any(v[3] > 0 for v in want.values()), "no pruned-high tokens"
    assert any(v[1] > 0 for v in want.values()), "no kept tokens"


def test_wave2_plans_clean(spark, sf001):
    """Plan-shape pin: the three new faces sweep clean through the
    full plan audit (cartesian allowlist + SMJ review encoded in
    plan_audit.py, not ad-hoc)."""
    from export_oltp_to_olap_spark import plan_audit

    rows = plan_audit.audit_plans(
        spark,
        sf001,
        names=[
            "hard_negative_mining",
            "hard_negative_ivf",
            "label_knn_ivf",
            "lsh_recall_audit",
            "simhash_recall_audit",
            "vocab_prune_rewrite",
            "vocab_df_delta",
            "length_outlier_report",
        ],
    )
    flagged = {r["query"]: r["flags"] for r in rows if r["flags"]}
    assert not flagged, flagged


def test_hard_negative_ivf_recall_vs_brute(spark, sf001):
    """The IVF scale path loses only unprobed-list negatives: measured
    recall vs the brute baseline is 0.92 at sf0.001 (nprobe=4 of 16
    lists); pin ≥ 0.8 so a probe-geometry regression fails while the
    measured headroom absorbs fixture noise.  Also the structural laws:
    labels differ, ranks are 1..k per emitting query."""
    emb = load_tables(spark, sf001, ("embeddings",))["embeddings"]
    ivf_rows = similarity.hard_negative_ivf(emb).collect()
    per_q: dict[int, list[int]] = {}
    for r in ivf_rows:
        assert r["label"] != r["neg_label"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    ivf = {(r["query_id"], r["neg_id"]) for r in ivf_rows}
    brute = {
        (r["vec_id"], r["neg_id"])
        for r in similarity.hard_negative_mining(emb).collect()
        if r["vec_id"] < 10
    }
    assert len(ivf & brute) / len(brute) >= 0.8


def test_label_knn_ivf_flag_agreement(spark, sf001):
    """The IVF-shortlisted label-noise audit must agree with the brute
    face on the FLAG verdict for ≥ 80% of vectors (measured 0.88 at
    sf0.001 — on the isotropic fixture the k-NN identity itself is
    noise-dominated, so majority labels churn while the verdict holds;
    see the operator docstring)."""
    emb = load_tables(spark, sf001, ("embeddings",))["embeddings"]
    brute = {
        r["vec_id"]: r["flagged"]
        for r in similarity.label_knn_noise(emb).collect()
    }
    ivf = {
        r["vec_id"]: r["flagged"]
        for r in similarity.label_knn_ivf(emb).collect()
    }
    assert set(ivf) == set(brute)  # every vector audited in both
    agree = sum(1 for v in ivf if ivf[v] == brute[v])
    assert agree / len(ivf) >= 0.8, agree / len(ivf)


def test_vocab_artifact_roundtrip_and_ingest_equivalence(spark, sf001, tmp_path):
    """The frozen (tok, cls) artifact round-trips through parquet, and
    the at-ingest pure-map pruner under that artifact reproduces the
    full batch face byte-identically when the artifact derives from
    the same corpus."""
    docs = _docs(spark, sf001)
    art = tmp_path / "vocab_classes.parquet"
    text_queries.save_vocab_classes(text_queries.vocab_class_table(docs), str(art))
    vocab = text_queries.load_vocab_classes(str(art))
    assert set(vocab.values()) <= {-1, 0, 1} and len(vocab) > 0
    got = {
        r["doc_id"]: tuple(r)
        for r in text_queries.vocab_prune_at_ingest(docs, vocab).collect()
    }
    want = {
        r["doc_id"]: tuple(r)
        for r in text_queries.vocab_prune_rewrite(docs).collect()
    }
    assert got == want


def test_vocab_prune_streams_at_ingest(spark, sf001, tmp_path):
    """Stream ≡ batch for the artifact-gated pruner: a pure map plan,
    append-mode legal, fed through the shared file-feed fixture."""
    import json as _json
    import os as _os

    from pyspark.sql import types as T

    docs = _docs(spark, sf001)
    vocab = {
        r["tok"]: r["cls"] for r in text_queries.vocab_class_table(docs).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    feed = tmp_path / "feed"
    feed.mkdir()
    chunks = [rows[:77], rows[77:200], rows[200:]]
    for i, chunk in enumerate(chunks):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        _os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).json(str(feed))
    out = []
    q = (
        text_queries.vocab_prune_at_ingest(stream, vocab)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: tuple(r) for r in out}
    want = {
        r["doc_id"]: tuple(r)
        for r in text_queries.vocab_prune_at_ingest(docs, vocab).collect()
    }
    assert got == want


def test_vocab_df_delta_monoid_merge(spark, sf001):
    """Incremental ≡ rebuild for the vocabulary df table at several cut
    points (the doc_length_spectrum_delta sweep convention)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf001)
    full = {
        (r["tok"], r["df"]) for r in text_queries.vocab_df_counts(docs).collect()
    }
    max_id = docs.agg(F.max("doc_id")).first()[0]
    for frac in (0.0, 0.5, 0.97):
        cut = int(frac * max_id)
        standing = docs.where(F.col("doc_id") <= cut)
        delta = docs.where(F.col("doc_id") > cut)
        merged = {
            (r["tok"], r["df"])
            for r in text_queries.vocab_df_delta(
                delta, text_queries.vocab_df_counts(standing)
            ).collect()
        }
        assert merged == full, frac


def test_vocab_classes_cli_roundtrip(spark, sf001, tmp_path):
    """`cli vocab-classes` persists the artifact the at-ingest pruner
    consumes; applying the CLI-written artifact reproduces the full
    batch face (the eval-hashes compute-once contract)."""
    from export_oltp_to_olap_spark import cli

    art = tmp_path / "vocab_classes.parquet"
    rc = cli.main(
        ["vocab-classes", "--source-dir", sf001, "--out", str(art)], spark=spark
    )
    assert rc == 0
    vocab = text_queries.load_vocab_classes(str(art))
    docs = _docs(spark, sf001)
    got = {
        r["doc_id"]: tuple(r)
        for r in text_queries.vocab_prune_at_ingest(docs, vocab).collect()
    }
    want = {
        r["doc_id"]: tuple(r)
        for r in text_queries.vocab_prune_rewrite(docs).collect()
    }
    assert got == want


def test_length_outlier_pure_python_recount(spark, sf001):
    """Full-row recount of the rank-based length report in pure
    Python: same tokenizer, explicit sorted-list indexing at
    ceil(p·n), strict cap-count comparisons."""
    import math

    docs = _docs(spark, sf001)
    pdf = docs.select("source", "text").toPandas()
    tok_re = re.compile(r"[^a-z0-9]+")
    by_src: dict[str, list[int]] = {}
    for r in pdf.itertuples():
        n = len([t for t in tok_re.split(r.text.lower()) if t])
        by_src.setdefault(r.source, []).append(n)
    want = {}
    for src, lens in by_src.items():
        lens.sort()
        n = len(lens)
        pick = lambda p: lens[math.ceil(p * n / 100) - 1]  # noqa: E731
        p10, p90 = pick(10), pick(90)
        want[src] = (
            n,
            pick(1),
            pick(50),
            pick(99),
            pick(25),
            pick(75),
            sum(1 for v in lens if v < p10),
            sum(1 for v in lens if v > p90),
        )
    got = {
        r["source"]: (
            r["n_docs"],
            r["p01"],
            r["p50"],
            r["p99"],
            r["q1"],
            r["q3"],
            r["n_below_p10"],
            r["n_above_p90"],
        )
        for r in text_queries.length_outlier_report(docs).collect()
    }
    assert got == want
    # non-degeneracy: the cap counts must fire somewhere
    assert any(v[6] > 0 for v in want.values())
    assert any(v[7] > 0 for v in want.values())


def test_simhash_recall_audit_planted(spark):
    """Identical twins have Hamming 0 → found with certainty → band 10
    recall 1; the SimHash false-positive row (band −1) keeps its two
    counts equal by construction."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (1, base),
        (2, base),
        (3, "one two three four five six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["band"]: r for r in neardup.simhash_recall_audit(docs).collect()}
    assert out[10]["n_pairs"] == out[10]["n_recalled"] == 1
    for band, r in out.items():
        assert r["n_recalled"] <= r["n_pairs"]
        if band < 0:
            assert r["n_pairs"] == r["n_recalled"]


def test_vocab_prune_matches_python_reference_on_random_corpora(spark):
    """Hypothesis: the df band-pass equals a pure-Python recount on
    random corpora — empty docs, punctuation-only text, repeated
    tokens, tiny vocabularies where the bands collapse."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    tok_re = re.compile(r"[^a-z0-9]+")
    word = st.text(alphabet="ab1", min_size=1, max_size=2)
    doc = st.lists(word, min_size=0, max_size=10).map(" ".join)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=st.lists(doc, min_size=1, max_size=12))
    def check(docs):
        rows = [(i, t) for i, t in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        toks = {i: [t for t in tok_re.split(t_.lower()) if t] for i, t_ in rows}
        n_docs = len(rows)
        dfc: dict[str, int] = {}
        for ts in toks.values():
            for t in set(ts):
                dfc[t] = dfc.get(t, 0) + 1
        lo, hi = (
            text_queries.VOCAB_PRUNE_LO_PCT,
            text_queries.VOCAB_PRUNE_HI_PCT,
        )

        def cls(t):
            d = dfc[t]
            if d * 100 < lo * n_docs:
                return -1
            if d * 100 > hi * n_docs:
                return 1
            return 0

        want = {}
        for i, ts in toks.items():
            kept = [t for t in ts if cls(t) == 0]
            want[i] = (
                len(ts),
                len(kept),
                sum(1 for t in ts if cls(t) == -1),
                sum(1 for t in ts if cls(t) == 1),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_kept"],
                r["n_pruned_low"],
                r["n_pruned_high"],
                r["kept_fp"],
            )
            for r in text_queries.vocab_prune_rewrite(df).collect()
        }
        assert got == want

    check()


def test_length_report_matches_python_reference_on_random_corpora(spark):
    """Hypothesis: exact rank picks + strict cap counts equal the
    pure-Python reference on random corpora (single-doc sources, ties,
    all-equal lengths, empty docs)."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    tok_re = re.compile(r"[^a-z0-9]+")
    word = st.text(alphabet="ab1", min_size=1, max_size=2)
    doc = st.lists(word, min_size=0, max_size=10).map(" ".join)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.tuples(doc, st.sampled_from(["s1", "s2"])), min_size=1, max_size=12
        )
    )
    def check(docs):
        rows = [(i, t, s) for i, (t, s) in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        by_src: dict[str, list[int]] = {}
        for _, t, s in rows:
            by_src.setdefault(s, []).append(
                len([x for x in tok_re.split(t.lower()) if x])
            )
        want = {}
        for s, lens in by_src.items():
            lens.sort()
            n = len(lens)
            pick = lambda p: lens[math.ceil(p * n / 100) - 1]  # noqa: E731
            p10, p90 = pick(10), pick(90)
            want[s] = (
                n,
                pick(1),
                pick(50),
                pick(99),
                pick(25),
                pick(75),
                sum(1 for v in lens if v < p10),
                sum(1 for v in lens if v > p90),
            )
        got = {
            r["source"]: (
                r["n_docs"],
                r["p01"],
                r["p50"],
                r["p99"],
                r["q1"],
                r["q3"],
                r["n_below_p10"],
                r["n_above_p90"],
            )
            for r in text_queries.length_outlier_report(df).collect()
        }
        assert got == want

    check()


def test_decontam_curve_monotone_and_consistent(spark, sf001):
    """An (n+1)-gram collision implies its two n-gram sub-windows
    collide, so flagged-train-doc counts are NON-INCREASING in n (a
    theorem, pinned); the FIXTURE_N point must agree with the
    registered decontaminate_documents face's flagged count."""
    from export_oltp_to_olap_spark.operators import decontam

    docs = _docs(spark, sf001)
    curve = {
        r["n"]: (r["n_train_docs_flagged"], r["n_leaked_grams"])
        for r in decontam.decontam_threshold_curve(docs).collect()
    }
    ns = sorted(curve)
    assert ns == sorted(decontam.DECONTAM_CURVE_NS)
    for lo, hi in zip(ns, ns[1:]):
        assert curve[hi][0] <= curve[lo][0], (lo, hi, curve)
    flagged_at_fixture_n = decontam.decontaminate_docs(docs).count()
    assert curve[decontam.FIXTURE_N][0] == flagged_at_fixture_n
    # non-degenerate: the curve must actually bend on the fixture
    assert curve[ns[0]][0] > curve[ns[-1]][0]


def test_pack_bins_delta_cut_sweep(spark, sf001):
    """Incremental ≡ rebuild for the packing summary at several cut
    points, including the degenerate all-standing / all-delta edges."""
    from pyspark.sql import functions as F

    from export_oltp_to_olap_spark.operators import chunking

    docs = _docs(spark, sf001)
    full = {
        (r["source"], r["bin"]): (r["n_docs"], r["n_tokens"])
        for r in chunking.pack_bins_summary(docs).collect()
    }
    max_id = docs.agg(F.max("doc_id")).first()[0]
    for frac in (0.0, 0.5, 0.97):
        cut = int(frac * max_id)
        standing = docs.where(F.col("doc_id") <= cut)
        delta = docs.where(F.col("doc_id") > cut)
        merged = {
            (r["source"], r["bin"]): (r["n_docs"], r["n_tokens"])
            for r in chunking.pack_bins_delta(
                delta,
                chunking.pack_bins_summary(standing),
                chunking.pack_source_totals(standing),
            ).collect()
        }
        assert merged == full, frac
