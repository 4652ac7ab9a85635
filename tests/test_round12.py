"""Round-12 contracts: the winnowing recall audit (the third lexical
family data card), a cross-engine pin on the winnowing CANDIDATE set
(the r11 banding bug's lesson applied to the last undiffed lexical
candidate generator), and the audit faces' eager cache release."""

from __future__ import annotations

import duckdb

from export_oltp_to_olap_spark.operators import neardup, winnow
from export_oltp_to_olap_spark.sources.parquet import load_tables


def _docs(spark, sf001):
    return load_tables(spark, sf001, ("documents",))["documents"]


def test_winnow_candidate_parity_cross_engine(spark, sf001):
    """The winnowing clone-signal CANDIDATE pair set must equal the
    DuckDB restatement exactly — candidate-set diffs are the check the
    r11 minhash banding fix proved necessary (a misaligned candidate
    stage hid for ten rounds behind verified outputs)."""
    docs = _docs(spark, sf001).select("doc_id", "text")
    spark_pairs = sorted(
        (r["doc_a"], r["doc_b"])
        for r in winnow.winnow_candidate_pairs(docs).collect()
    )
    con = duckdb.connect()
    con.register("documents_arrow", docs.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_arrow")
    sql = (
        "WITH "
        + neardup.shingle_cte()  # provides the shared `toks` CTE
        + ",\n"
        + winnow.winnow_candidate_ctes()
        + "\nSELECT doc_a, doc_b FROM candidates"
    )
    duck_pairs = sorted(tuple(r) for r in con.execute(sql).fetchall())
    con.close()
    assert spark_pairs, "fixture produced no candidate pairs — weak test"
    assert spark_pairs == duck_pairs


def test_winnow_recall_audit_planted(spark):
    """Planted corpus: identical twins share every fingerprint (same
    grams, same positions) so the clone signal must recall their band-10
    truth pair; the unrelated doc contributes no truth pair; the band −1
    row's two counts agree by construction."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (1, base),
        (2, base),  # identical twin: jaccard 1.0, identical fingerprints
        (3, base.replace("kappa", "zzz")),  # near twin: shared substrings
        (4, "one two three four five six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["band"]: r for r in neardup.winnow_recall_audit(docs).collect()}
    assert 10 in out, out
    assert out[10]["n_pairs"] == out[10]["n_recalled"] == 1
    for band, r in out.items():
        assert r["n_recalled"] <= r["n_pairs"]
        if band >= 0:
            assert 5 <= band <= 10
        else:
            assert r["n_pairs"] == r["n_recalled"]  # all candidates


def test_recall_audits_release_their_cache(spark, sf001):
    """VERDICT r11 item 5: the audit faces localCheckpoint their ≤12-row
    result and unpersist the shared shingle-set cache before returning,
    so no storage blocks outlive the call and evict neighbours
    mid-bench."""
    def persistent_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    docs = _docs(spark, sf001)
    before = persistent_ids()
    for fn in (
        neardup.lsh_recall_audit,
        neardup.simhash_recall_audit,
        neardup.winnow_recall_audit,
    ):
        out = fn(docs)
        assert out.count() >= 2  # already materialized; count is trivial
    after = persistent_ids()
    # localCheckpoint RDDs of the tiny result frames are reference-held
    # until GC; what must NOT remain is the shingle-set cache, which is
    # the only persist() these faces issue.  The storage delta therefore
    # may contain only the three ≤12-row checkpoint RDDs.
    leaked = after - before
    assert len(leaked) <= 3, f"audit faces leaked cached RDDs: {leaked}"
