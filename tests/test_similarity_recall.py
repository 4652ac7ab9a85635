"""Approximate-ANN quality: IVF and LSH recall vs the brute-force baseline."""

from __future__ import annotations

import pytest

from export_oltp_to_olap_spark.operators import similarity as S
from export_oltp_to_olap_spark.sources.parquet import load_tables


@pytest.fixture(scope="module")
def emb(spark, sf0001):
    return load_tables(spark, sf0001, ("embeddings",))["embeddings"]


def test_ivf_recall_vs_bruteforce(emb):
    """IVF top-10 must recover a solid share of the exact top-10 — with
    16 lists and 4 probes the expected list coverage is ~25% of the
    corpus, so recall well above that floor shows the lists are real."""
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(emb).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in S.ivf_cosine_topk(emb).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f} barely beats random probing"


def test_ivf_scores_are_exact_for_returned_pairs(emb):
    """Approximation may drop neighbors, never mis-score them: every
    returned (query, neighbor) cos must equal the brute-force value."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in S.cosine_topk(emb, k=10**6).collect()
    }
    for r in S.ivf_cosine_topk(emb).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["cos"] == exact[key]


def test_lsh_recall_vs_bruteforce(emb):
    exact = {(r["vec_a"], r["vec_b"]) for r in S.cosine_neardup(emb, 0.4).collect()}
    got = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_cosine_neardup(emb, threshold=0.4).collect()
    }
    assert got <= exact, "LSH verification must make precision exact"
    recall = len(exact & got) / max(len(exact), 1)
    assert recall >= 0.7, f"LSH recall {recall:.2f}"


def test_lsh_candidates_prune_pair_space(emb):
    """The scale path must PRUNE: candidate volume well under N²/2.

    Round 1's defaults (L=4, b=2) produced ~68% of the pair space — an
    all-pairs join with extra shuffles.  The retuned bands measure ~24.5%
    on this corpus (numpy replay of the same md5 planes); 0.30 gives
    headroom without letting a pruning regression slip through.
    """
    n = emb.count()
    n_candidates = S.lsh_candidate_pairs(emb).count()
    assert n_candidates <= 0.30 * n * (n - 1) / 2, (
        f"LSH candidates {n_candidates} ≥ 30% of {n * (n - 1) // 2} pairs"
    )


def test_ivf_kmeans_centroids_recall(emb):
    """Learned (KMeans) IVF lists must match-or-beat the deterministic
    first-N stand-in's recall — the flag exists precisely because learned
    centroids give retrieval-quality lists."""
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(emb).collect()
    }
    learned = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_cosine_topk(emb, centroid_mode="kmeans").collect()
    }
    recall_learned = len(exact & learned) / len(exact)
    # Probing 4 of 16 lists covers ~25% of the corpus, so uninformative
    # lists would land recall ≈ 0.25; 0.4 proves the learned lists group
    # genuinely similar vectors (measured ~0.57 on this fixture).  The
    # first-N mode is NOT the bar here — its "centroids" are the query
    # vectors themselves, which inflates its recall by construction.
    assert recall_learned >= 0.4, f"kmeans IVF recall {recall_learned:.2f}"


# ---------------------------------------------------------------------------
# Product quantization (operators/pq.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_books(emb):
    from export_oltp_to_olap_spark.operators import pq as PQ

    return PQ.train_codebooks(emb)


def test_pq_encode_shape_and_determinism(emb, pq_books):
    """Codes are M ints in [0, ksub); encoding is deterministic (fixed
    k-means seeds) — the property a persisted compressed index needs."""
    from export_oltp_to_olap_spark.operators import pq as PQ

    a = {r["vec_id"]: r["codes"] for r in PQ.pq_encode(emb, pq_books).collect()}
    b = {r["vec_id"]: r["codes"] for r in PQ.pq_encode(emb, pq_books).collect()}
    assert a == b and len(a) == emb.count()
    for codes in a.values():
        assert len(codes) == PQ.PQ_M
        assert all(0 <= c < PQ.PQ_KSUB for c in codes)


def test_pq_recall_and_exact_scores(emb, pq_books):
    """ADC ranking over 8-byte codes must recover the exact top-10 —
    the r14 64k shortlist exceeds this 500-vector fixture, so the
    rescore is full-corpus here (measured 1.0, floored 0.95) — and
    every returned pair's cos is the brute-force value (the exact
    rescore contract)."""
    from export_oltp_to_olap_spark.operators import pq as PQ
    from export_oltp_to_olap_spark.operators import similarity as S

    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in S.cosine_topk(emb, k=10**6).collect()
    }
    exact_top = {
        (r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(emb).collect()
    }
    got = PQ.pq_cosine_topk(emb, codebooks=pq_books).collect()
    got_pairs = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact_top & got_pairs) / len(exact_top)
    assert recall >= 0.95, f"PQ recall {recall:.2f} below floor"
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        assert exact_all[key] == r["cos"]


def test_ivfpq_recall_and_exact_scores(emb):
    """IVF-PQ (coarse lists + residual codes): recall floor vs brute
    force and the exact-score contract.  At the r14 operating point
    (nprobe=12, shortlist 64k — see pq.py) the shortlist exceeds this
    500-vector corpus, so fixture recall IS the probed-coverage
    ceiling: measured 0.97, floored at 0.90."""
    from export_oltp_to_olap_spark.operators import pq as PQ
    from export_oltp_to_olap_spark.operators import similarity as S

    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in S.cosine_topk(emb, k=10**6).collect()
    }
    exact_top = {
        (r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(emb).collect()
    }
    got = PQ.ivfpq_cosine_topk(emb).collect()
    got_pairs = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact_top & got_pairs) / len(exact_top)
    assert recall >= 0.9, f"IVF-PQ recall {recall:.2f} below floor"
    for r in got:
        assert exact_all[(r["query_id"], r["neighbor_id"])] == r["cos"]


def test_rp_projection_is_deterministic_and_map_side(emb):
    a = S.project_embeddings(emb).select("vec_id", "proj").collect()
    b = S.project_embeddings(emb).select("vec_id", "proj").collect()
    assert sorted(r["proj"] for r in a) == sorted(r["proj"] for r in b)
    dims = {len(r["proj"]) for r in a}
    assert dims == {S.RP_DIM_OUT}


def test_rp_recall_and_exact_scores(emb):
    """JL-compressed shortlist must recover most of the exact top-10 at
    4× compression, and every returned score must equal brute force —
    the rescore-in-full-space contract shared by IVF/PQ/LSH."""
    exact_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(emb).collect()
    }
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in S.cosine_topk(emb, k=10**6).collect()
    }
    got = S.rp_cosine_topk(emb).collect()
    got_pairs = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    # the r14 128k shortlist exceeds this 500-vector fixture, so the
    # rerank IS a full rescore here: fixture recall measured 1.0
    assert recall >= 0.95, f"RP recall {recall:.2f} at 4x compression"
    for r in got:
        assert r["cos"] == exact_scores[(r["query_id"], r["neighbor_id"])]
