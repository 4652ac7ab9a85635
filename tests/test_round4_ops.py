"""Unit tests for the round-4 operators: benchmark decontamination,
PII scan/redaction, normalized-text dedup, embedding hygiene stats.

Cross-engine value equality for each is covered by
tests/test_oracle_correctness.py (every registration with an oracle);
these tests pin the SEMANTICS on crafted inputs the synthetic fixtures
don't contain (real PII strings, planted contamination, case/punct
duplicate variants, zero/ragged vectors).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from export_oltp_to_olap_spark.operators.decontam import contamination_hits
from export_oltp_to_olap_spark.operators.neardup import normalized_dedup_docs
from export_oltp_to_olap_spark.operators.similarity import embedding_norm_stats
from export_oltp_to_olap_spark.plans.text_queries import pii_redact, pii_scan

_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def test_contamination_flags_only_docs_sharing_ngrams(spark):
    corpus = _docs(
        spark,
        [
            # shares the 4-gram "the quick brown fox" with the eval doc
            (1, "note that the quick brown fox appears here"),
            # same words but never 4 consecutive ones in common
            (2, "quick fox brown the jumped over"),
            (3, "completely unrelated content about spark plans"),
            (4, "too short"),  # < n tokens → no n-grams, never flagged
        ],
    )
    eval_docs = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    out = {r["doc_id"]: r for r in contamination_hits(corpus, eval_docs, n=4).collect()}
    assert set(out) == {1}
    assert out[1]["n_overlap"] == 1
    assert out[1]["n_ngrams"] == 5  # 8 tokens → 5 distinct 4-grams
    assert abs(out[1]["overlap_ratio"] - 0.2) < 1e-9


def test_contamination_counts_repeated_benchmark_phrase_once(spark):
    phrase = "alpha beta gamma delta"
    corpus = _docs(spark, [(1, f"{phrase} filler {phrase} filler {phrase}")])
    eval_docs = _docs(spark, [(100, phrase)])
    (row,) = contamination_hits(corpus, eval_docs, n=4).collect()
    # the doc repeats the planted 4-gram 3×, but distinct-gram counting
    # registers one overlap — ratio reflects contamination, not repetition
    assert row["n_overlap"] == 1


def test_contamination_normalizes_case_and_punctuation(spark):
    corpus = _docs(spark, [(1, "The QUICK, brown... FOX jumps!")])
    eval_docs = _docs(spark, [(100, "the quick brown fox")])
    (row,) = contamination_hits(corpus, eval_docs, n=4).collect()
    assert row["doc_id"] == 1 and row["n_overlap"] == 1


# ---------------------------------------------------------------------------
# PII scan / redaction
# ---------------------------------------------------------------------------


def _pii_docs(spark):
    return spark.createDataFrame(
        [
            (1, "Mail a.b-c_9@Sub.Example.co.uk and x@y.io today"),
            (2, "server 10.0.0.1 fell back to 192.168.100.200"),
            (3, "call 555-123-4567 or 555.987.6543 anytime"),
            (4, "nothing sensitive here, just 12345 and v1.2"),
        ],
        _DOC_SCHEMA,
    )


def test_pii_counts_per_category(spark):
    out = {r["doc_id"]: r for r in pii_scan(_pii_docs(spark)).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ipv4"] == 0 and out[1]["n_phone"] == 0
    assert out[2]["n_ipv4"] == 2 and out[2]["n_email"] == 0
    assert out[3]["n_phone"] == 2
    assert out[4]["n_pii"] == 0
    assert out[1]["n_pii"] == 2 and out[2]["n_pii"] == 2 and out[3]["n_pii"] == 2


def test_pii_redaction_removes_matches_and_keeps_clean_text(spark):
    docs = _pii_docs(spark)
    red = {
        r["doc_id"]: r["red"]
        for r in docs.select("doc_id", pii_redact(F.lower("text")).alias("red")).collect()
    }
    assert red[1] == "mail <EMAIL> and <EMAIL> today"
    assert red[2] == "server <IP> fell back to <IP>"
    assert red[3] == "call <PHONE> or <PHONE> anytime"
    assert red[4] == "nothing sensitive here, just 12345 and v1.2"


def test_pii_fingerprint_unchanged_for_clean_docs(spark):
    docs = _pii_docs(spark)
    out = {r["doc_id"]: r["redacted_fp"] for r in pii_scan(docs).collect()}
    plain = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", F.md5(F.lower("text")).alias("fp")).collect()
    }
    assert out[4] == plain[4]  # clean doc: redaction is the identity
    assert out[1] != plain[1]  # PII doc: fingerprint reflects redaction


# ---------------------------------------------------------------------------
# Normalized-text dedup
# ---------------------------------------------------------------------------


def test_normalized_dedup_collapses_case_punct_whitespace_variants(spark):
    docs = _docs(
        spark,
        [
            (10, "Hello, World!"),
            (11, "hello   world"),
            (12, "HELLO-WORLD."),
            (13, "hello world again"),  # different canon — stays separate
        ],
    )
    rows = normalized_dedup_docs(docs).collect()
    by_keeper = {r["keeper_doc_id"]: r for r in rows}
    assert set(by_keeper) == {10, 13}
    assert by_keeper[10]["n_copies"] == 3
    assert by_keeper[10]["n_raw_variants"] == 3  # exact dedup would miss all 3
    assert by_keeper[13]["n_copies"] == 1


def test_normalized_dedup_groups_exact_copies_without_inflating_variants(spark):
    docs = _docs(spark, [(1, "same text"), (2, "same text"), (3, "Same Text")])
    (row,) = normalized_dedup_docs(docs).collect()
    assert row["keeper_doc_id"] == 1
    assert row["n_copies"] == 3
    assert row["n_raw_variants"] == 2  # "same text" + "Same Text"


# ---------------------------------------------------------------------------
# Embedding hygiene stats
# ---------------------------------------------------------------------------

_EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def test_embedding_stats_flag_zero_and_ragged_vectors(spark):
    emb = spark.createDataFrame(
        [
            (1, [3.0, 4.0], 0),  # norm 5
            (2, [0.0, 0.0], 0),  # dead vector
            (3, [1.0, 0.0, 0.0], 0),  # ragged: dim 3 in a dim-2 corpus
            (4, [0.6, 0.8], 1),  # unit norm
        ],
        _EMB_SCHEMA,
    )
    out = {r["label"]: r for r in embedding_norm_stats(emb).collect()}
    assert out[0]["n_vecs"] == 3
    assert out[0]["n_zero"] == 1
    assert (out[0]["dim_min"], out[0]["dim_max"]) == (2, 3)  # ragged surfaces here
    assert abs(out[0]["norm_min"] - 0.0) < 1e-9
    assert abs(out[0]["norm_max"] - 5.0) < 1e-9
    assert abs(out[0]["norm_avg"] - 2.0) < 1e-9  # (5 + 0 + 1) / 3
    assert out[1]["n_zero"] == 0 and abs(out[1]["norm_avg"] - 1.0) < 1e-9


def test_embedding_stats_on_fixture_corpus_is_healthy(spark, sf001):
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    emb = load_tables(spark, sf001, ("embeddings",))["embeddings"]
    rows = embedding_norm_stats(emb).collect()
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert r["n_zero"] == 0
        assert r["dim_min"] == r["dim_max"] == 64
        assert abs(r["norm_avg"] - 1.0) < 1e-6  # generator emits unit norms


# ---------------------------------------------------------------------------
# Chunking / packing
# ---------------------------------------------------------------------------


def test_chunking_covers_every_token_with_expected_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    docs = _docs(spark, [(1, text), (2, "only three tokens here"), (3, "")])
    from export_oltp_to_olap_spark.operators.chunking import chunk_documents

    rows = sorted(
        chunk_documents(docs, chunk=32, overlap=8).collect(),
        key=lambda r: (r["doc_id"], r["chunk_index"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # stride 24: offsets 0,24,48,72 → 4 chunks; last covers 72..99 (28 toks)
    assert [r["chunk_index"] for r in d1] == [0, 1, 2, 3]
    assert [r["n_tokens"] for r in d1] == [32, 32, 32, 28]
    # total tokens = n + overlap * (n_chunks - 1): every token covered,
    # consecutive chunks share exactly `overlap` tokens
    assert sum(r["n_tokens"] for r in d1) == 100 + 8 * 3
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["n_tokens"] == 4  # short doc: one chunk
    assert not [r for r in rows if r["doc_id"] == 3]  # empty doc: none


def test_chunk_fingerprints_are_reconstructable(spark):
    docs = _docs(spark, [(1, "a b c d e f")])
    from export_oltp_to_olap_spark.operators.chunking import chunk_documents
    import hashlib

    rows = chunk_documents(docs, chunk=4, overlap=2).collect()
    toks = "a b c d e f".split()
    for r in sorted(rows, key=lambda r: r["chunk_index"]):
        start = r["chunk_index"] * 2
        expect = " ".join(toks[start : start + 4])
        assert r["chunk_fp"] == hashlib.md5(expect.encode()).hexdigest()


def _pack_docs(spark, n=40, source="s"):
    # doc i has i+1 tokens → token volumes are distinguishable
    return spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(i + 1)), source) for i in range(n)],
        "doc_id long, text string, source string",
    )


def test_pack_bins_are_contiguous_and_respect_start_offsets(spark):
    from export_oltp_to_olap_spark.operators.chunking import pack_assignments

    docs = _pack_docs(spark, n=40)
    rows = sorted(pack_assignments(docs, window=50).collect(), key=lambda r: r["doc_id"])
    # starts are the exclusive prefix sums of token counts in doc_id order
    acc = 0
    for r in rows:
        assert r["start"] == acc
        assert r["bin"] == acc // 50
        acc += r["n_tokens"]
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins)  # bins never go backwards in doc order
    assert len(set(bins)) > 1  # the fixture actually spans multiple bins


def test_pack_sharding_preserves_totals_and_bounds_bins(spark):
    from export_oltp_to_olap_spark.operators.chunking import pack_assignments

    docs = _pack_docs(spark, n=60)
    flat = pack_assignments(docs, window=64, shards=1).collect()
    sharded = pack_assignments(docs, window=64, shards=4).collect()
    # same docs, same token counts — packing layout changes, volume doesn't
    assert sum(r["n_tokens"] for r in flat) == sum(r["n_tokens"] for r in sharded)
    assert {r["doc_id"] for r in flat} == {r["doc_id"] for r in sharded}
    # within every (source, shard), starts are again exclusive prefix sums
    from collections import defaultdict

    groups = defaultdict(list)
    for r in sharded:
        groups[(r["source"], r["shard"])].append(r)
    assert len(groups) > 1  # sharding actually split the stream
    for g in groups.values():
        acc = 0
        for r in sorted(g, key=lambda r: r["doc_id"]):
            assert r["start"] == acc
            acc += r["n_tokens"]


# ---------------------------------------------------------------------------
# Weighted sampling / gap-fill interpolation
# ---------------------------------------------------------------------------


def test_weighted_sample_monotone_and_stable(spark, sf001):
    from export_oltp_to_olap_spark.operators.sampling import weighted_sample
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    docs = load_tables(spark, sf001, ("documents",))["documents"]
    w_half = (F.col("n_chars") * 0 + 0.5).alias("w")
    lo = {r["doc_id"] for r in weighted_sample(docs, "doc_id", F.lit(0.2)).collect()}
    hi = {r["doc_id"] for r in weighted_sample(docs, "doc_id", F.lit(0.6)).collect()}
    assert lo <= hi  # monotone: raising every weight only ADDS rows
    again = {
        r["doc_id"]
        for r in weighted_sample(docs.repartition(13), "doc_id", F.lit(0.2)).collect()
    }
    assert lo == again  # membership is layout-independent
    n = docs.count()
    kept = len({r["doc_id"] for r in weighted_sample(docs, "doc_id", w_half).collect()})
    assert abs(kept / n - 0.5) < 0.08  # rate tracks the weight


def test_weighted_sample_clamps_degenerate_weights(spark):
    from export_oltp_to_olap_spark.operators.sampling import weighted_sample

    docs = spark.createDataFrame(
        [(1, -0.5), (2, 0.0), (3, 1.0), (4, 7.0)], "doc_id long, w double"
    )
    kept = {r["doc_id"] for r in weighted_sample(docs, "doc_id", "w").collect()}
    assert 1 not in kept and 2 not in kept  # w <= 0 never keeps
    assert 3 in kept and 4 in kept  # w >= 1 always keeps


def test_gapfill_interpolation_on_crafted_series(spark):
    import datetime

    from export_oltp_to_olap_spark.plans.events import events_gapfill_locf

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # observations at buckets 0 and 30 min (grid 10 min) → two gap
    # buckets at 10 and 20 min; value goes 3.0 → 9.0
    events = spark.createDataFrame(
        [
            (1, at(1), 100, "a", 3.0, "{}"),
            (2, at(31), 100, "a", 9.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    rows = {
        r["bucket_ts"].minute: r for r in events_gapfill_locf(events).collect()
    }
    assert sorted(rows) == [0, 10, 20, 30]
    assert rows[10]["is_gap"] and rows[20]["is_gap"]
    assert rows[10]["filled_value"] == 3.0 and rows[20]["filled_value"] == 3.0  # locf
    assert abs(rows[10]["interp_value"] - 5.0) < 1e-9  # 3 + (9-3)*(10/30)
    assert abs(rows[20]["interp_value"] - 7.0) < 1e-9
    assert rows[0]["interp_value"] == 3.0 and rows[30]["interp_value"] == 9.0


def test_gapfill_leading_and_trailing_gaps_stay_null_on_interp(spark):
    import datetime

    from export_oltp_to_olap_spark.plans.events import events_gapfill_locf

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    # two series: 'b' has a single observation; scaffolds never extend
    # beyond a series' own observed range, so no leading/trailing rows
    # exist for it, while 'a' interpolates interior gaps only
    events = spark.createDataFrame(
        [
            (1, t0, 100, "a", 2.0, "{}"),
            (2, t0 + datetime.timedelta(minutes=21), 100, "a", 8.0, "{}"),
            (3, t0 + datetime.timedelta(minutes=5), 100, "b", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = events_gapfill_locf(events).collect()
    a_rows = [r for r in out if r["event_type"] == "a"]
    b_rows = [r for r in out if r["event_type"] == "b"]
    assert len(a_rows) == 3 and len(b_rows) == 1
    assert all(r["interp_value"] is not None for r in a_rows)
    assert b_rows[0]["interp_value"] == 1.0


def test_cap_per_stratum_quota_and_hash_order(spark, sf001):
    from export_oltp_to_olap_spark.operators.sampling import cap_per_stratum
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    docs = load_tables(spark, sf001, ("documents",))["documents"]
    kept = cap_per_stratum(docs, "doc_id", "source", cap=5).collect()
    per_src = {}
    for r in kept:
        per_src.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) <= 5 for v in per_src.values())
    # hash order, not id order: at least one stratum keeps a non-prefix set
    full = {}
    for r in docs.select("source", "doc_id").collect():
        full.setdefault(r["source"], []).append(r["doc_id"])
    assert any(
        sorted(per_src[s]) != sorted(full[s])[:5]
        for s in per_src
        if len(full[s]) > 5
    )
    # strata smaller than the cap pass through whole
    for s, ids in full.items():
        if len(ids) <= 5:
            assert sorted(per_src[s]) == sorted(ids)
    # reproducible under repartition
    again = {
        (r["source"], r["doc_id"])
        for r in cap_per_stratum(docs.repartition(13), "doc_id", "source", 5).collect()
    }
    assert again == {(r["source"], r["doc_id"]) for r in kept}


def test_anomaly_zscore_flags_planted_spike(spark):
    import datetime

    from export_oltp_to_olap_spark.plans.events import events_anomaly_zscore

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # 20 calm buckets alternating 10/12, then one 100.0 spike
    for i in range(20):
        rows.append(
            (i, t0 + datetime.timedelta(minutes=10 * i), 1, "a",
             10.0 if i % 2 == 0 else 12.0, "{}")
        )
    rows.append((99, t0 + datetime.timedelta(minutes=200), 1, "a", 100.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = sorted(
        events_anomaly_zscore(events).collect(), key=lambda r: r["bucket_ts"]
    )
    assert not any(r["is_anomaly"] for r in out[:-1])  # calm series stays calm
    spike = out[-1]
    assert spike["is_anomaly"] and spike["zscore"] > 3
    # early buckets with too little history score NULL, not false alarms
    assert all(r["zscore"] is None for r in out[:6])


def test_scd2_reverting_value_starts_new_version(spark):
    from export_oltp_to_olap_spark.operators.scd import scd2_versions

    changes = spark.createDataFrame(
        [
            (1, 10, "A"), (1, 11, "A"),  # run 1: A
            (1, 12, "B"),                # run 2: B
            (1, 13, "A"),                # run 3: A again — NOT merged with run 1
            (2, 20, None), (2, 21, None),  # null-safe: one version
            (2, 22, "C"),
        ],
        "k long, seq long, attr string",
    )
    rows = scd2_versions(changes, "k", "seq", ["attr"]).collect()
    k1 = [r for r in rows if r["k"] == 1]
    assert [(r["version_seq"], r["attr"]) for r in k1] == [(1, "A"), (2, "B"), (3, "A")]
    assert [(r["valid_from"], r["valid_to"]) for r in k1] == [(10, 12), (12, 13), (13, None)]
    assert [r["is_current"] for r in k1] == [False, False, True]
    assert [r["n_observations"] for r in k1] == [2, 1, 1]
    k2 = [r for r in rows if r["k"] == 2]
    assert [(r["version_seq"], r["attr"]) for r in k2] == [(1, None), (2, "C")]


def test_minhash_delta_equals_full_run_restriction(spark, sf001):
    from pyspark.sql import functions as SF

    from export_oltp_to_olap_spark.operators.neardup import (
        minhash_lsh_neardup,
        minhash_lsh_neardup_delta,
    )
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    docs = load_tables(spark, sf001, ("documents",))["documents"].select("doc_id", "text")
    delta = docs.where(SF.col("doc_id") % 7 == 3)
    corpus = docs.where(SF.col("doc_id") % 7 != 3)
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in minhash_lsh_neardup_delta(corpus, delta).collect()
    }
    delta_ids = {r["doc_id"] for r in delta.collect()}
    want = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in minhash_lsh_neardup(docs).collect()
        if r["doc_a"] in delta_ids or r["doc_b"] in delta_ids
    }
    assert want, "no delta-touching pairs in the fixture — vacuous"
    assert got == want


def test_text_ops_survive_null_and_empty_text(spark):
    """NULL/empty text rows (real pipelines have them) must not crash
    the quality/drift path — found as ANSI divide-by-zero in round 4."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from export_oltp_to_olap_spark.plans.text_queries import (
        pii_scan as pii,
        split_drift_report,
        text_quality,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    docs = spark.createDataFrame(
        [
            (1, "normal text here", "en", "a", 16),
            (2, None, "en", "a", None),
            (3, "", "en", "b", 0),
            (4, "x y z w v", "en", "b", 9),
        ],
        schema,
    )
    tq_rows = {r["doc_id"]: r for r in text_quality(docs).collect()}
    assert len(tq_rows) == 4
    assert tq_rows[3]["punct_ratio"] == 0.0  # guarded, not an exception
    assert split_drift_report(docs).collect() is not None
    assert len(pii(docs).collect()) == 4


def test_similarity_family_survives_null_vectors(spark):
    """NULL embedding rows (failed encoder outputs) must be dropped by
    the similarity/ANN entry points, not crash the Arrow batches; the
    hygiene report is where they surface."""
    import random

    from export_oltp_to_olap_spark.operators import pq, semdedup, similarity

    def v(seed):
        r = random.Random(seed)
        return [r.uniform(-1, 1) for _ in range(64)]

    emb = spark.createDataFrame(
        [(1, v(1), 0), (2, None, 0), (3, v(3), None), (4, v(4), 1)], _EMB_SCHEMA
    )
    assert len(similarity.cosine_topk(emb).collect()) == 6  # 3 live vecs × 2
    similarity.cosine_neardup(emb).collect()
    similarity.lsh_cosine_neardup(emb).collect()
    assert len(similarity.ivf_cosine_topk(emb).collect()) == 6
    assert len(pq.pq_cosine_topk(emb).collect()) == 6
    kept = semdedup.semantic_dedup(emb).collect()
    assert {r["vec_id"] for r in kept} == {1, 3, 4}  # null vec excluded


def test_scd2_apply_delta_equals_full_rebuild(spark):
    """Incremental SCD2 merge ≡ full rebuild, for every prefix/suffix
    split of the change feed (new version, extended version, reverted
    value, brand-new key, untouched key all exercised)."""
    from export_oltp_to_olap_spark.operators.scd import scd2_apply_delta, scd2_versions

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("seq", LongType()),
            StructField("attr", StringType()),
        ]
    )
    feed = [
        # key 1: version a (2 obs), then b, then back to a (revert)
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"),
        # key 2: one long version extended by late rows
        (2, 1, "x"), (2, 2, "x"), (2, 5, "x"), (2, 6, "x"),
        # key 3: only early rows (untouched by late deltas)
        (3, 1, "m"), (3, 2, "n"),
        # key 4: appears only late (brand-new key in the delta)
        (4, 5, "z"), (4, 6, "w"),
    ]
    df = spark.createDataFrame(feed, schema)
    full = scd2_versions(df, "k", "seq", ["attr"])

    def canon(rows):
        return sorted(tuple(r) for r in rows)

    want = canon(full.collect())
    for split_at in (2, 3, 4, 5):
        prefix = df.where(F.col("seq") <= split_at)
        delta = df.where(F.col("seq") > split_at)
        existing = scd2_versions(prefix, "k", "seq", ["attr"])
        merged = scd2_apply_delta(existing, delta, "k", "seq", ["attr"])
        assert canon(merged.collect()) == want, f"split at seq={split_at}"


def test_scd2_apply_delta_fixture_scale(spark, sf0001):
    """Incremental ≡ rebuild on the real fixture fanout (sf0.001)."""
    from export_oltp_to_olap_spark.operators.scd import scd2_apply_delta, scd2_versions
    from export_oltp_to_olap_spark.plans.fixtures_adapter import (
        oltp_tables_from_fixtures,
    )
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    tables = load_tables(
        spark, sf0001, ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    )
    oltp = oltp_tables_from_fixtures(tables)
    fanout = (
        oltp["clientes"]
        .select("id_cliente")
        .join(
            oltp["orden"].select("id_cliente", "id_orden", "ciudad_envio", "pais_envio"),
            "id_cliente",
        )
        .select(
            "id_cliente",
            "id_orden",
            F.col("ciudad_envio").alias("ciudad"),
            F.col("pais_envio").alias("pais"),
        )
    )
    args = ("id_cliente", "id_orden", ["ciudad", "pais"])
    full = scd2_versions(fanout, *args)
    cut = fanout.agg(F.expr("percentile_approx(id_orden, 0.8)")).collect()[0][0]
    existing = scd2_versions(fanout.where(F.col("id_orden") <= cut), *args)
    merged = scd2_apply_delta(
        existing, fanout.where(F.col("id_orden") > cut), *args
    )
    want = sorted(tuple(r) for r in full.collect())
    got = sorted(tuple(r) for r in merged.collect())
    assert got == want


def test_scd2_streaming_maintenance_converges(spark, tmp_path):
    """`scd2_apply_delta` as a foreachBatch maintainer: an id-ordered
    change stream folded batch-by-batch into a parquet SCD2 table ends
    identical to the full rebuild — the streaming warehouse-maintenance
    form of the incremental merge."""
    import json
    import os

    from pyspark.sql import types as T

    from export_oltp_to_olap_spark.operators.scd import scd2_apply_delta, scd2_versions

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("attr", T.StringType()),
        ]
    )
    feed_rows = [
        (1, 1, "a"), (1, 2, "a"), (2, 1, "x"),
        (1, 3, "b"), (3, 3, "m"),
        (1, 4, "a"), (2, 5, "x"), (3, 6, "n"), (4, 6, "z"),
    ]
    feed = tmp_path / "scd_feed"
    feed.mkdir()
    for i, chunk in enumerate([feed_rows[:3], feed_rows[3:5], feed_rows[5:]]):
        with open(feed / f"b{i}.json", "w") as f:
            for k, seq, attr in chunk:
                f.write(json.dumps({"k": k, "seq": seq, "attr": attr}) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    dim_path = str(tmp_path / "scd2_dim")
    args = ("k", "seq", ["attr"])

    def maintain(batch_df, _):
        if batch_df.isEmpty():
            return
        if os.path.exists(dim_path):
            existing = spark.read.parquet(dim_path)
            merged = scd2_apply_delta(existing, batch_df, *args)
        else:
            merged = scd2_versions(batch_df, *args)
        # stage to break lineage on the table being overwritten
        merged.localCheckpoint().write.mode("overwrite").parquet(dim_path)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
        .writeStream.foreachBatch(maintain)
        .option("checkpointLocation", str(tmp_path / "scd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = sorted(
        tuple(r)
        for r in scd2_versions(spark.createDataFrame(feed_rows, schema), *args).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(dim_path).collect())
    assert got == want


# ---------------------------------------------------------------------------
# source_overlap_matrix — inter-source near-duplication matrix
# ---------------------------------------------------------------------------


def test_source_overlap_matrix_attributes_pairs_to_source_pairs(spark):
    from export_oltp_to_olap_spark.operators.neardup import source_overlap_matrix

    base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    rows = [
        # near-dup pair across newsA/newsB (one trailing token differs)
        (1, base, "newsA"),
        (2, base + " again", "newsB"),
        # near-dup pair WITHIN newsA (diagonal cell)
        (3, base + " tonight", "newsA"),
        # unrelated doc: appears in no cell
        (4, "completely different content about databases and query engines", "blogC"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    cells = {
        (r.source_a, r.source_b): (r.n_pairs, r.max_jaccard)
        for r in source_overlap_matrix(docs, threshold=0.7).collect()
    }

    # doc1~doc2 crosses newsA/newsB; doc1~doc3 and doc2~doc3 both involve
    # newsA — doc2~doc3 crosses (newsA, newsB) too, so that cell holds 2.
    assert set(cells) == {("newsA", "newsB"), ("newsA", "newsA")}
    assert cells[("newsA", "newsA")][0] == 1
    assert cells[("newsA", "newsB")][0] == 2
    # sources are ordered within the pair: no (newsB, newsA) mirror cell
    assert ("newsB", "newsA") not in cells
    for n_pairs, max_j in cells.values():
        assert n_pairs >= 1 and 0.7 <= max_j <= 1.0


def test_eval_gram_collect_cap_fails_loudly(spark, monkeypatch):
    """VERDICT r4 item 3: an eval suite whose distinct n-gram count
    exceeds the broadcast budget must raise before the driver collects
    it — with the cap monkeypatched low so the guard itself is what
    trips, and the normal path (same set, cap restored) unchanged."""
    import pytest as _pytest

    from export_oltp_to_olap_spark.operators import decontam

    eval_docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(decontam, "MAX_EVAL_GRAMS", 3)
    with _pytest.raises(ValueError, match="distinct"):
        decontam.eval_gram_hashes(eval_docs)
    monkeypatch.setattr(decontam, "MAX_EVAL_GRAMS", 16_777_216)
    grams = decontam.eval_gram_hashes(eval_docs)
    assert 3 < len(grams) <= 10 and list(grams) == sorted(grams)
