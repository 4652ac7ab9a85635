"""Round-10 face contracts beyond the shared oracle diff: crafted-input
rule checks for the C4 filter (both faces), cross-engine pins on a
corpus that actually exercises the line rules (the fixture corpus is
single-line and punctuation-free, so the registered oracle's variety
rides on counts — these tests carry the rule mechanics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.plans import text_queries


NL = "\n"
_GOOD_LINES = NL.join(
    [
        "Good line with five words here.",
        "Another fine sentence sits right here!",
        "Third one also has enough words.",
    ]
)

_CRAFTED = [
    (1, _GOOD_LINES, "en", "web", 100),                      # passes everything
    (2, "short." + NL + "no terminal punct many words here", "en", "web", 40),
    (3, "lorem ipsum dolor sit amet everywhere." + NL + _GOOD_LINES, "en", "web", 150),
    (4, "This javascript line has enough words today." + NL + _GOOD_LINES, "en", "web", 160),
    (5, "Brace { in the page body." + NL + _GOOD_LINES, "en", "web", 130),
    (6, "Only two good lines survive here." + NL + "Second survivor line is right here.", "en", "web", 70),
    (7, "", "en", "books", 0),                               # empty page
]
_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _duck_view(rows, tmp_path, spark):
    import duckdb

    pq = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, _SCHEMA).toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    return con


def test_c4_rules_fire_on_crafted_violations(spark):
    df = spark.createDataFrame(_CRAFTED, _SCHEMA)
    out = {r.doc_id: r.asDict() for r in text_queries.c4_quality_flags(df).collect()}
    assert out[1]["keep"] is True and out[1]["n_kept_lines"] == 3
    assert out[2]["flag_min_sentences"] is False  # 0 rule-passing lines
    assert out[3]["flag_no_lorem"] is False
    assert out[4]["keep"] is True  # javascript drops the LINE, not the page
    assert out[4]["n_kept_lines"] == 3 and out[4]["n_lines"] == 4
    assert out[5]["flag_no_brace"] is False
    assert out[6]["flag_min_sentences"] is False  # 2 < 3 kept lines
    assert out[7]["n_words"] == 0 and out[7]["keep"] is False
    assert all(out[i]["keep"] is False for i in (2, 3, 5, 6, 7))


def test_c4_flags_match_duckdb_on_crafted_corpus(spark, tmp_path):
    con = _duck_view(_CRAFTED, tmp_path, spark)
    df = spark.createDataFrame(_CRAFTED, _SCHEMA)
    got = sorted(tuple(r) for r in text_queries.c4_quality_flags(df).collect())
    want = sorted(tuple(r) for r in con.execute(text_queries.C4_QUALITY_SQL).fetchall())
    assert got == want


def test_c4_line_filter_rewrite_matches_duckdb(spark, tmp_path):
    con = _duck_view(_CRAFTED, tmp_path, spark)
    df = spark.createDataFrame(_CRAFTED, _SCHEMA)
    got = sorted(tuple(r) for r in text_queries.c4_line_filter(df).collect())
    want = sorted(
        tuple(r) for r in con.execute(text_queries.C4_LINE_FILTER_SQL).fetchall()
    )
    assert got == want
    # Only the surviving pages, and only their rule-passing lines.
    kept = {r[0]: r for r in got}
    assert set(kept) == {1, 4}
    assert "javascript" not in kept[4][4]
    assert kept[4][3] > 0  # removed_chars counts the dropped line


def test_text_repetition_long_doc_stays_linear(spark):
    """`text_repetition` shares `max_multiplicity`'s run-length fold —
    the same 40k-token all-distinct worst case that pinned the Gopher
    fix must stay fast here too (the old distinct×filter form was
    per-row O(L²) in this face as well)."""
    import time

    n_tok = 40_000
    text = " ".join(f"w{i}" for i in range(n_tok))
    df = spark.createDataFrame(
        [(1, text, "en", "web", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    t0 = time.monotonic()
    (row,) = text_queries.text_repetition(df).collect()
    elapsed = time.monotonic() - t0
    assert row.n_tokens == n_tok
    assert row.top_token_count == 1 and row.top_bigram_count == 1
    assert elapsed < 60, f"repetition pass took {elapsed:.1f}s on a 40k-token row"


def test_max_multiplicity_matches_python_on_mixed_shapes(spark):
    from export_oltp_to_olap_spark.functions.text import max_multiplicity

    cases = [
        ([], 0),
        (["a"], 1),
        (["a", "b", "a", "a", "b"], 3),
        (["x"] * 7, 7),
        (["", "", "a"], 2),  # empty strings are ordinary elements
    ]
    df = spark.createDataFrame(
        [(i, arr) for i, (arr, _) in enumerate(cases)],
        "i long, arr array<string>",
    )
    got = {r.i: r.m for r in df.select("i", max_multiplicity(F.col("arr")).alias("m")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_boilerplate_flag_fires_on_templated_corpus(spark):
    """A source whose pages share a footer must surface the footer
    bigrams with is_boilerplate=True under the majority rule; the
    varied-content source must not flag anything."""
    footer = "copyright acme corp all rights reserved"
    rows = [
        (i, f"unique words number {i} alpha beta. {footer}", "en", "templated", 60)
        for i in range(10)
    ] + [
        (100 + i, " ".join(f"w{i}x{j}" for j in range(12)), "en", "varied", 60)
        for i in range(10)
    ]
    out = text_queries.boilerplate_ngrams(
        spark.createDataFrame(rows, _SCHEMA)
    ).collect()
    t = [r for r in out if r.source == "templated"]
    v = [r for r in out if r.source == "varied"]
    assert any(r.is_boilerplate and "copyright acme" == r.gram for r in t)
    # every footer bigram is in all 10 docs
    footer_bgs = {
        f"{a} {b}" for a, b in zip(footer.split(), footer.split()[1:])
    }
    flagged = {r.gram for r in t if r.is_boilerplate}
    assert footer_bgs <= flagged
    assert not any(r.is_boilerplate for r in v)
    assert all(r.doc_count == 1 for r in v)  # all-distinct content
    # rank determinism: ties broken by gram text
    grams_t = [r.gram for r in t]
    assert grams_t == sorted(grams_t, key=lambda g: (-[r.doc_count for r in t if r.gram == g][0], g))


def test_boilerplate_and_lang_mismatch_match_duckdb_on_crafted(spark, tmp_path):
    rows = [
        (1, "the cat and the dog sat. the cat and the dog ran.", "en", "a", 50),
        (2, "the cat and the dog sat. something else here too.", "en", "a", 50),
        (3, "le chat et la mer et le vin", "en", "a", 30),     # mislabeled fr
        (4, "der hund und die katze ist da", "de", "b", 30),   # correct de
        (5, "zz yy xx ww vv uu", "zh", "b", 20),               # no markers -> und
    ]
    con = _duck_view(rows, tmp_path, spark)
    df = spark.createDataFrame(rows, _SCHEMA)
    got = sorted(tuple(r) for r in text_queries.boilerplate_ngrams(df).collect())
    want = sorted(
        tuple(r) for r in con.execute(text_queries.BOILERPLATE_NGRAMS_SQL).fetchall()
    )
    assert got == want
    got_l = sorted(tuple(r) for r in text_queries.lang_mismatch_report(df).collect())
    want_l = sorted(
        tuple(r) for r in con.execute(text_queries.LANG_MISMATCH_SQL).fetchall()
    )
    assert got_l == want_l
    by_key = {(r[0], r[1]): r for r in got_l}
    assert by_key[("a", "en")][3] == 1  # the planted fr doc mismatches
    assert by_key[("b", "de")][3] == 0
    assert by_key[("b", "zh")][3] == 1  # markerless -> 'und' != 'zh'


def test_curriculum_manifest_partitions_corpus_and_is_stable(spark, sf001):
    """The manifest partitions the corpus exactly (Σ n_docs = corpus
    size), bands stay in range, and the table is a pure function of
    doc ids + text (stable under repartition)."""
    from export_oltp_to_olap_spark.operators.sampling import curriculum_manifest

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = curriculum_manifest(docs).collect()
    assert sum(r.n_docs for r in out) == docs.count()
    assert all(0 <= r.band < 10 and 0 <= r.shard < 8 for r in out)
    again = curriculum_manifest(docs.repartition(13)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # hash-sharding balance: every shard non-empty at 500 docs
    shards = {r.shard for r in out}
    assert shards == set(range(8))


def test_label_knn_noise_flags_planted_mislabels(spark):
    """Two tight, well-separated clusters; one vector in each carries
    the other cluster's label.  Exactly those two must flag, and every
    clean vector's majority must equal its own label."""
    import random

    from export_oltp_to_olap_spark.operators.similarity import label_knn_noise

    rng = random.Random(7)

    def vec(center, jitter=0.02):
        return [c + rng.uniform(-jitter, jitter) for c in center]

    c0 = [1.0] + [0.0] * 7
    c1 = [0.0] * 7 + [1.0]
    rows = []
    for i in range(12):
        rows.append((i, vec(c0), 0))
        rows.append((100 + i, vec(c1), 1))
    rows.append((200, vec(c0), 1))  # planted: cluster-0 vector labeled 1
    rows.append((201, vec(c1), 0))  # planted: cluster-1 vector labeled 0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.vec_id: r for r in label_knn_noise(emb).collect()}
    assert out[200].flagged and out[200].majority_label == 0
    assert out[201].flagged and out[201].majority_label == 1
    clean = [r for i, r in out.items() if i not in (200, 201)]
    assert all(not r.flagged for r in clean)
    assert all(r.n_agree >= 4 for r in clean)  # k=5, tight clusters


def test_cli_c4_filter_flags_and_rewrite(spark, sf001, tmp_path, capsys):
    """`c4-filter` persists the flag table (summary shape shared with
    gopher-filter) and, with --rewrite, the transformed corpus; on the
    punctuation-free fixture the rewrite survives zero pages — honest,
    and asserted rather than hidden."""
    import json

    from export_oltp_to_olap_spark.cli import main

    out = str(tmp_path / "flags")
    rc = main(["c4-filter", "--source-dir", sf001, "--out", out], spark=spark)
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_docs"] == 500 and s["n_kept"] == 0
    assert s["rejected_by_rule"]["flag_min_sentences"] == 500
    api = {r.doc_id: r.keep for r in text_queries.c4_quality_flags(
        spark.read.parquet(f"{sf001}/documents.parquet")).collect()}
    persisted = {r.doc_id: r.keep for r in spark.read.parquet(out).collect()}
    assert persisted == api

    out2 = str(tmp_path / "rewrite")
    rc = main(
        ["c4-filter", "--source-dir", sf001, "--out", out2, "--rewrite"],
        spark=spark,
    )
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["surviving_pages"] == 0 and s2["kept_chars"] == 0


def test_boilerplate_delta_equals_rebuild_on_any_slicing(spark, sf001):
    """The count-merge delta face equals a full rebuild for ANY
    standing/delta split, not just the fixture's 90% cut — the
    commutative-monoid claim, tested at three cut points."""
    from export_oltp_to_olap_spark.plans.text_queries import (
        _boilerplate_counts,
        boilerplate_ngrams,
        boilerplate_ngrams_delta,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    full = sorted(map(tuple, boilerplate_ngrams(docs).collect()))
    for cut in (50, 250, 499):
        standing = docs.where(F.col("doc_id") <= cut)
        delta = docs.where(F.col("doc_id") > cut)
        sc, st = _boilerplate_counts(standing)
        got = sorted(
            map(tuple, boilerplate_ngrams_delta(delta, sc, st).collect())
        )
        assert got == full, f"cut={cut}"
