"""SemDeDup semantic contract: keep/drop policy, cluster scoping, modes.

The oracle equivalence itself runs in test_oracle_correctness (the
operator is registered); these pin the SEMANTICS the oracle can't state:
the drop rule really is "lower-id witness in the SAME cluster", the kept
set is what a global near-dup scan restricted to clusters would give,
and the kmeans mode preserves the output contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.semdedup import (
    SEMDEDUP_THRESHOLD,
    semantic_dedup,
)
from export_oltp_to_olap_spark.operators.similarity import cosine_neardup


def _emb(spark, sf0001):
    return spark.read.parquet(f"{sf0001}/embeddings.parquet")


def test_dropped_rows_have_lower_id_witness_in_same_cluster(spark, sf0001):
    out = semantic_dedup(_emb(spark, sf0001)).cache()
    rows = {r.vec_id: r for r in out.collect()}
    assert rows, "empty output"
    # Global exact near-dup pairs at the same threshold — the witness pool.
    pairs = cosine_neardup(_emb(spark, sf0001), threshold=SEMDEDUP_THRESHOLD).collect()
    by_high = {}
    for p in pairs:
        by_high.setdefault(p.vec_b, []).append((p.vec_a, p.cos))
    dropped = [r for r in rows.values() if not r.kept]
    assert dropped, "fixture corpus produced no semantic dups — test is vacuous"
    for r in dropped:
        witnesses = [
            (a, cos)
            for a, cos in by_high.get(r.vec_id, [])
            if rows[a].cluster_id == r.cluster_id
        ]
        assert witnesses, f"vec {r.vec_id} dropped without a same-cluster witness"
        assert r.dup_cos == max(c for _, c in witnesses)
    # Kept rows: no same-cluster lower-id pair above threshold.
    for r in rows.values():
        if r.kept:
            assert not any(
                rows[a].cluster_id == r.cluster_id
                for a, _ in by_high.get(r.vec_id, [])
            )
            assert r.dup_cos is None


def test_every_vector_appears_exactly_once(spark, sf0001):
    emb = _emb(spark, sf0001)
    out = semantic_dedup(emb)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()


def test_kmeans_mode_same_contract(spark, sf0001):
    """Learned clusters change the partition, not the output contract."""
    emb = _emb(spark, sf0001)
    out = semantic_dedup(emb, centroid_mode="kmeans").cache()
    assert out.count() == emb.count()
    bad = out.where(
        (F.col("kept") & F.col("dup_cos").isNotNull())
        | (~F.col("kept") & F.col("dup_cos").isNull())
    ).count()
    assert bad == 0
