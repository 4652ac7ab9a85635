"""ANN recall tracking at sf0.1 (VERDICT r4 item 6): ONE table-driven
test measuring recall@k and candidate fraction for all five approximate
paths — LSH / IVF / PQ / IVF-PQ / RP — against the brute-force baseline,
written to RECALL.json at the repo root so parameter drift is visible
round-over-round (a retuned band count or shortlist multiplier changes
the committed artifact, not just a hidden assertion margin).

The sf0.1 recall FLOORS live in the _METHODS table here and nowhere
else.  The per-method tests in test_similarity_recall.py keep the
contracts floors can't express (exact-score rescore, LSH precision,
kmeans-vs-first list quality) at fixture scale.

Reading the committed artifact: IVF's 0.99 is inflated by the "first"
centroid mode (centroids ARE the query vectors — the oracle-restatable
stand-in); PQ/RP rerank shortlists are ABSOLUTE row counts (64k and
128k per query), so their fixture-scale rescored/candidate fractions
look large (32%/64% of 2000 vectors) while vanishing at production N
— recall drift with N is exactly what this artifact exists to
surface.  Round 14 raised all three compressed-index points off their
measured sweeps: IVF-PQ nprobe=12 / shortlist=64k (the full nprobe ×
shortlist grid is in pq.py), PQ shortlist 4k→64k, RP 16k→128k (curves
beside each constant).  All five paths are seeded/deterministic, so
floors sit close under the measured values.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import pq as PQ
from export_oltp_to_olap_spark.operators import similarity as S
from export_oltp_to_olap_spark.sources.parquet import load_tables

K = 10
N_QUERIES = 10
LSH_THRESHOLD = 0.4

_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECALL.json"
)


def _ivf_coverage(base, centroids, n_probe, n_vectors):
    """Measured probed-list coverage: Σ_q |probed lists| / (n_queries·N)
    — the fraction of the corpus each query's exact-cosine stage
    actually scores (the IVF pruning claim, measured not assumed)."""
    ranked = S.rank_centroids(base, centroids)
    sizes = (
        ranked.where(F.col("cen_rank") == 1)
        .groupBy("cen_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    probed = (
        ranked.where(
            (F.col("vec_id") < N_QUERIES) & (F.col("cen_rank") <= n_probe)
        )
        .join(sizes, "cen_id")
        .agg(F.sum("n_members").alias("tot"))
        .first()["tot"]
    )
    return probed / (N_QUERIES * n_vectors)


# name -> (floor, topk_fn) ; candidate fractions are computed per-method
# below because their definitions differ (pair space vs probed lists vs
# rerank shortlist).
_METHODS = {
    "ivf": (0.95, lambda emb: S.ivf_cosine_topk(emb)),
    # r14 64k shortlist: sweep 0.44/0.55/0.68/0.85/0.98 at 4/8/16/32/64
    # (in-call-trained codebooks — this card's truth path; see pq.py)
    "pq": (0.95, lambda emb: PQ.pq_cosine_topk(emb)),
    # shipped point nprobe=12, shortlist=64k (VERDICT r13 item 4; the
    # r8 6/16k point's 0.68 had become the weakest card): every grid
    # row saturates at its coverage ceiling, so the raise is mostly
    # nprobe — 12/16 lists measure 0.90 here (ceiling 0.91), floored
    # at 0.85.  Full grid in pq.py above IVFPQ_NPROBE.
    "ivfpq": (0.85, lambda emb: PQ.ivfpq_cosine_topk(emb)),
    # r14 128k shortlist: sweep 0.50/0.63/0.80/0.95 at 16/32/64/128
    # (curve beside RP_SHORTLIST_MULT in similarity.py)
    "rp": (0.90, lambda emb: S.rp_cosine_topk(emb)),
}
LSH_FLOOR = 0.80
LSH_CANDIDATE_CEILING = 0.30  # same non-degrading bound as test_scale_growth


@pytest.fixture(scope="module")
def emb01(spark, sf01):
    return load_tables(spark, sf01, ("embeddings",))["embeddings"]


@pytest.mark.slow
def test_recall_tracking_artifact(spark, sf01, emb01):
    n = emb01.count()
    exact_top = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk(emb01, n_queries=N_QUERIES, k=K).collect()
    }
    assert len(exact_top) == N_QUERIES * K

    base = S.with_norm(emb01).select("vec_id", "embedding", "norm")
    report: dict[str, dict] = {}

    for name, (floor, fn) in _METHODS.items():
        got = {(r["query_id"], r["neighbor_id"]) for r in fn(emb01).collect()}
        report[name] = {
            "recall_at_k": round(len(exact_top & got) / len(exact_top), 4),
            "floor": floor,
        }
    report["ivf"]["candidate_fraction"] = round(
        _ivf_coverage(
            base,
            S.centroid_table(base, S.IVF_CENTROIDS, "first"),
            S.IVF_NPROBE,
            n,
        ),
        4,
    )
    report["ivfpq"]["candidate_fraction"] = round(
        _ivf_coverage(
            base,
            S.centroid_table(base, PQ.IVFPQ_CENTROIDS, "kmeans"),
            PQ.IVFPQ_NPROBE,
            n,
        ),
        4,
    )
    # PQ/RP rank by scanning ALL compressed codes/projections (bandwidth
    # pruning, not scan pruning); their candidate fraction is the share
    # of RAW vectors the exact rescore touches.
    report["pq"]["candidate_fraction"] = round(
        min(1.0, PQ.PQ_SHORTLIST_MULT * K / n), 4
    )
    report["rp"]["candidate_fraction"] = round(
        min(1.0, S.RP_SHORTLIST_MULT * K / n), 4
    )

    exact_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in S.cosine_neardup(emb01, LSH_THRESHOLD).collect()
    }
    lsh_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_cosine_neardup(emb01, threshold=LSH_THRESHOLD).collect()
    }
    lsh_cand_frac = S.lsh_candidate_pairs(emb01).count() / (n * (n - 1) / 2)
    report["lsh"] = {
        "recall_at_k": round(len(exact_pairs & lsh_pairs) / max(len(exact_pairs), 1), 4),
        "floor": LSH_FLOOR,
        "candidate_fraction": round(lsh_cand_frac, 4),
        "note": f"pair recall at cos>={LSH_THRESHOLD}, not top-k",
    }

    # nprobe sweep for the shipping IVF geometry (VERDICT r5 item 8):
    # the recall/cost trade-off at 2/4/8 probed lists, so a parameter
    # retune shows up as a CURVE shift in the committed artifact, not a
    # single drifting point.  Floors bound the curve's shape: recall
    # must be monotone non-decreasing in nprobe, and the shipped
    # nprobe=4 point must match the headline ivf entry above.
    nprobe_sweep = {}
    for p in (2, 4, 8):
        got_p = {
            (r["query_id"], r["neighbor_id"])
            for r in S.ivf_cosine_topk(emb01, nprobe=p).collect()
        }
        nprobe_sweep[str(p)] = {
            "recall_at_k": round(len(exact_top & got_p) / len(exact_top), 4),
            "candidate_fraction": round(
                _ivf_coverage(
                    base, S.centroid_table(base, S.IVF_CENTROIDS, "first"), p, n
                ),
                4,
            ),
        }
    report["ivf"]["nprobe_sweep"] = nprobe_sweep
    recalls = [nprobe_sweep[str(p)]["recall_at_k"] for p in (2, 4, 8)]
    assert recalls == sorted(recalls), f"recall not monotone in nprobe: {recalls}"
    assert (
        nprobe_sweep[str(S.IVF_NPROBE)]["recall_at_k"]
        == report["ivf"]["recall_at_k"]
    )

    # IVF-PQ shortlist sweep (VERDICT r7 item 4, widened r14): the
    # rescore-width dial at the shipped nprobe — recall must rise
    # monotonically with the shortlist, and the shipped multiplier must
    # match the headline entry, so a retune shows up as a curve shift
    # in the artifact.  Points = the r14 grid's mult axis (pq.py) plus
    # the historical 4× origin.
    shortlist_sweep = {}
    for mult in (4, 16, 32, PQ.IVFPQ_SHORTLIST_MULT):
        got_m = {
            (r["query_id"], r["neighbor_id"])
            for r in PQ.ivfpq_cosine_topk(emb01, shortlist_mult=mult).collect()
        }
        shortlist_sweep[str(mult)] = {
            "recall_at_k": round(len(exact_top & got_m) / len(exact_top), 4),
            "rescored_fraction": round(min(1.0, mult * K / n), 4),
        }
    report["ivfpq"]["shortlist_sweep"] = shortlist_sweep
    sl_recalls = [
        shortlist_sweep[str(m)]["recall_at_k"]
        for m in (4, 16, 32, PQ.IVFPQ_SHORTLIST_MULT)
    ]
    assert sl_recalls == sorted(sl_recalls), (
        f"recall not monotone in shortlist width: {sl_recalls}"
    )
    assert (
        shortlist_sweep[str(PQ.IVFPQ_SHORTLIST_MULT)]["recall_at_k"]
        == report["ivfpq"]["recall_at_k"]
    )

    # MERGE into the artifact rather than overwrite: RECALL.json also
    # carries the lexical family-audit section (jaccard_families, from
    # the registered *_recall_audit faces) — a wholesale dump here is
    # what silently dropped that section after round 11 recorded it.
    existing = {}
    if os.path.exists(_ARTIFACT):
        with open(_ARTIFACT, encoding="utf-8") as fh:
            existing = json.load(fh)
    existing.update(
        {"sf": 0.1, "n_vectors": n, "k": K, "n_queries": N_QUERIES,
         "methods": report}
    )
    with open(_ARTIFACT, "w", encoding="utf-8") as fh:
        json.dump(existing, fh, indent=1, sort_keys=True)

    failures = [
        f"{name}: recall {vals['recall_at_k']} < floor {vals['floor']}"
        for name, vals in report.items()
        if vals["recall_at_k"] < vals["floor"]
    ]
    assert not failures, "; ".join(failures)
    assert lsh_cand_frac <= LSH_CANDIDATE_CEILING, (
        f"LSH candidate fraction {lsh_cand_frac:.3f} degraded past "
        f"{LSH_CANDIDATE_CEILING} of the pair space"
    )
    # probed-list pruning really prunes: nprobe/n_centroids of the lists
    # must bound coverage loosely (skewed lists can exceed the exact
    # ratio; 2x headroom keeps the claim honest without flaking)
    for nm, probe_ratio in (
        ("ivf", S.IVF_NPROBE / S.IVF_CENTROIDS),
        ("ivfpq", PQ.IVFPQ_NPROBE / PQ.IVFPQ_CENTROIDS),
    ):
        assert report[nm]["candidate_fraction"] <= 2 * probe_ratio, (
            f"{nm} probes cover {report[nm]['candidate_fraction']:.2%} — "
            f"lists are too skewed to prune"
        )
