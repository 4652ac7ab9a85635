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


def _skewed_assigned(spark):
    """120 synthetic pre-assigned members: cluster 0 holds 100 of them
    (a 50%+-of-corpus hot cluster), cluster 1 the other 20."""
    rows = []
    for vid in range(120):
        cluster = 0 if vid < 100 else 1
        emb = [float(vid % 7 + 1), float(vid % 5 + 1)]
        norm = float((emb[0] ** 2 + emb[1] ** 2) ** 0.5)
        rows.append((vid, emb, norm, cluster))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, norm double, cluster_id int"
    )


def test_salted_pairs_identical_and_cell_capped(spark):
    """The salted self-join must produce EXACTLY the plain pair set, and
    no (cluster, sa, sb) join cell may see more than cap members per
    side (the hot cluster's 100·99/2 pairs spread over ceil(100/10)²
    cells instead of one reducer)."""
    from export_oltp_to_olap_spark.operators.semdedup import _within_cluster_pairs

    assigned = _skewed_assigned(spark)
    cap = 10
    plain = {
        (r.vec_a, r.vec_b)
        for r in _within_cluster_pairs(assigned).select("vec_a", "vec_b").collect()
    }
    salted_df = _within_cluster_pairs(assigned, max_members_per_pair_task=cap)
    salted = [
        (r.cluster_id, r["__sa"], r["__sb"], r.vec_a, r.vec_b)
        for r in salted_df.select(
            "cluster_id", "__sa", "__sb", "vec_a", "vec_b"
        ).collect()
    ]
    assert {(a, b) for _, _, _, a, b in salted} == plain
    assert len(salted) == len(plain), "a pair appeared in more than one cell"
    # Per-cell side sizes: count distinct members per (cluster, sa) and
    # (cluster, sb) group among emitted pairs.  Hash salting balances in
    # expectation (O(√cap) deviation — see _within_cluster_pairs), so the
    # enforced bound is 2×cap; the unsalted hot cluster would put all 100
    # members in one cell, an order of magnitude over it.
    from collections import defaultdict

    cell_a, cell_b = defaultdict(set), defaultdict(set)
    for c, sa, sb, a, b in salted:
        cell_a[(c, sa, sb)].add(a)
        cell_b[(c, sa, sb)].add(b)
    assert max(len(v) for v in cell_a.values()) <= 2 * cap
    assert max(len(v) for v in cell_b.values()) <= 2 * cap
    # And the hot cluster really spread: its pairs occupy many cells.
    hot_cells = {(sa, sb) for c, sa, sb, _, _ in salted if c == 0}
    assert len(hot_cells) >= 50, f"hot cluster used only {len(hot_cells)} cells"


def test_semantic_dedup_salted_output_identical(spark, sf0001):
    """End-to-end: the skew knob must not change a single decision."""
    base = {
        (r.vec_id, r.cluster_id, r.kept, r.dup_cos)
        for r in semantic_dedup(_emb(spark, sf0001)).collect()
    }
    salted = {
        (r.vec_id, r.cluster_id, r.kept, r.dup_cos)
        for r in semantic_dedup(
            _emb(spark, sf0001), max_members_per_pair_task=7
        ).collect()
    }
    assert base == salted
