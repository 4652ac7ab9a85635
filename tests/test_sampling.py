"""Properties of deterministic hash sampling/splits (operators/sampling.py)."""

from __future__ import annotations

from export_oltp_to_olap_spark.operators.sampling import (
    assign_splits,
    deterministic_sample,
)
from export_oltp_to_olap_spark.sources.parquet import load_tables


def _docs(spark, sf001):
    return load_tables(spark, sf001, ("documents",))["documents"]


def test_splits_are_exhaustive_and_stable_under_repartition(spark, sf001):
    docs = _docs(spark, sf001)
    a = {r["doc_id"]: r["split"] for r in assign_splits(docs, "doc_id").collect()}
    assert len(a) == docs.count()  # every row got exactly one split
    b = {
        r["doc_id"]: r["split"]
        for r in assign_splits(docs.repartition(13), "doc_id").collect()
    }
    assert a == b  # membership is a pure function of the key
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert abs(train / n - 0.8) < 0.06  # 500 docs: ~binomial noise


def test_same_salt_samples_nest_different_salts_decorrelate(spark, sf001):
    docs = _docs(spark, sf001)
    s10 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    s20 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    assert s10 <= s20  # growing the budget only ADDS rows (stable eval sets)
    other = {
        r["doc_id"]
        for r in deterministic_sample(docs, "doc_id", 0.2, salt="other").collect()
    }
    assert other != s20  # a fresh salt draws an independent subset


def test_stratified_sample_nests_and_respects_fractions(spark, sf001):
    """Same-salt stratified samples nest (0.1 subset of 0.25 subset of
    0.5) and per-stratum yields land near the requested fractions."""
    from export_oltp_to_olap_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf001}/documents.parquet").select(
        "doc_id", "source"
    )
    ids = lambda frac: {  # noqa: E731
        r.doc_id
        for r in stratified_sample(
            docs, "doc_id", "source", {"src0": frac}, default_fraction=0.0
        ).collect()
    }
    small, mid, big = ids(0.1), ids(0.25), ids(0.5)
    assert small <= mid <= big
    n_src0 = docs.where("source = 'src0'").count()
    assert 0 < len(mid) < n_src0
    assert abs(len(big) / n_src0 - 0.5) < 0.2


def test_stratified_sample_broadcast_path_matches_case_fold(spark, sf001):
    """A fraction map bigger than _CASE_FOLD_MAX takes the broadcast-join
    path; it must select exactly the rows the literal-CASE path selects
    for the same fractions (padding the map with absent strata flips the
    implementation without changing semantics)."""
    from export_oltp_to_olap_spark.operators import sampling

    docs = spark.read.parquet(f"{sf001}/documents.parquet").select("doc_id", "source")
    fractions = {"src0": 0.25, "src1": 0.5, "src2": 0.1}
    padded = dict(fractions)
    padded.update(
        {f"absent_stratum_{i}": 0.5 for i in range(sampling._CASE_FOLD_MAX + 1)}
    )
    assert len(fractions) <= sampling._CASE_FOLD_MAX < len(padded)
    case_ids = {
        r.doc_id
        for r in sampling.stratified_sample(
            docs, "doc_id", "source", fractions, default_fraction=0.3
        ).collect()
    }
    bcast_df = sampling.stratified_sample(
        docs, "doc_id", "source", padded, default_fraction=0.3
    )
    bcast_ids = {r.doc_id for r in bcast_df.collect()}
    assert case_ids == bcast_ids
    assert bcast_df.columns == docs.columns  # helper column dropped
    plan = bcast_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_mixture_weights_alpha_upweights_small_sources(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from export_oltp_to_olap_spark.operators.sampling import mixture_weights

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    rows = [(i, "big", "word " * 100) for i in range(50)] + [
        (100 + i, "small", "word " * 100) for i in range(2)
    ]
    out = {r["source"]: r for r in mixture_weights(spark.createDataFrame(rows, schema)).collect()}
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1.0) < 1e-5
    # α=0.5 must pull weights toward each other vs proportional shares.
    assert out["small"]["weight"] > out["small"]["share"]
    assert out["big"]["weight"] < out["big"]["share"]
    assert out["small"]["oversample_factor"] > 1 > out["big"]["oversample_factor"]


def test_epoch_allocation_arithmetic_and_budget(spark):
    """The plan's invariants: target tokens split the budget by weight,
    epochs = target/available (repeat_factor + residual consistent),
    and α-upweighted small sources repeat while big sources subsample."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from export_oltp_to_olap_spark.operators.sampling import epoch_allocation

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    rows = [(i, "big", "word " * 100) for i in range(50)] + [
        (100 + i, "small", "word " * 100) for i in range(2)
    ]
    out = {
        r["source"]: r
        for r in epoch_allocation(
            spark.createDataFrame(rows, schema), budget_tenths=15
        ).collect()
    }
    total = sum(r["tokens"] for r in out.values())
    budget = 15 * total // 10
    # The largest source absorbs the flooring/rounding remainder
    # (target = budget - sum(others)), so the plan sums to the budget
    # EXACTLY — no overshoot at any scale (closes the r8/r9 advisory).
    tgt = sum(r["target_tokens"] for r in out.values())
    assert tgt == budget
    # The anchor is the biggest source; its perturbation is < S tokens
    # of flooring slack plus the 6-dp rounding term (weights live on the
    # mixture_weights face now — join there for the published doubles).
    from export_oltp_to_olap_spark.operators.sampling import mixture_weights

    w = {
        r["source"]: r["weight"]
        for r in mixture_weights(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    anchor = out["big"]
    assert abs(anchor["target_tokens"] - w["big"] * budget) < len(out) + 1
    for r in out.values():
        # Integer-only published face: epochs/residual are exact
        # floor-div millionths, never round(double) (the r10 fix).
        assert r["repeat_factor"] == r["target_tokens"] // r["tokens"]
        assert r["residual_tokens"] == r["target_tokens"] % r["tokens"]
        assert (
            r["residual_millionths"]
            == r["residual_tokens"] * 1_000_000 // r["tokens"]
        )
        assert (
            r["epochs_millionths"]
            == r["repeat_factor"] * 1_000_000 + r["residual_millionths"]
        )
        assert 0 <= r["residual_millionths"] < 1_000_000
    # α=0.5 at a 1.5x budget: the small source must repeat (>1 epoch),
    # the big one must subsample (<1.5 epochs, pulled under its share)
    assert out["small"]["epochs_millionths"] > 1_500_000 > out["big"]["epochs_millionths"]


def test_cluster_balanced_sample_caps_and_is_deterministic(spark, sf001):
    from pyspark.sql import functions as F

    from export_oltp_to_olap_spark.operators import similarity as S

    emb = load_tables(spark, sf001, ("embeddings",))["embeddings"]
    out = S.cluster_balanced_sample(emb, cap=16)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["cen_id"], []).append(r)
    for cen, picks in per.items():
        assert len(picks) <= 16
        assert sorted(p["pick_rank"] for p in picks) == list(
            range(1, len(picks) + 1)
        )
        # a cluster smaller than the cap keeps every member
        size = picks[0]["cluster_size"]
        if size <= 16:
            assert len(picks) == size
    # the cap binds somewhere at this scale (500 vectors / 16 lists)
    assert any(p[0]["cluster_size"] > 16 for p in per.values())
    # deterministic under repartition (hash pick order, not RNG)
    again = S.cluster_balanced_sample(emb.repartition(7), cap=16).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in rows}
    # picks cover every cluster
    n_clusters = (
        S.rank_centroids(
            S.with_norm(emb).select("vec_id", "embedding", "norm"),
            S.centroid_table(
                S.with_norm(emb).select("vec_id", "embedding", "norm"),
                S.IVF_CENTROIDS,
            ),
        )
        .where(F.col("cen_rank") == 1)
        .select("cen_id")
        .distinct()
        .count()
    )
    assert len(per) == n_clusters


# ---------------------------------------------------------------------------
# Training-shard export
# ---------------------------------------------------------------------------


def test_shard_assignment_stable_under_repartition(spark, sf001):
    from export_oltp_to_olap_spark.operators.sampling import assign_shards

    docs = _docs(spark, sf001)
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in assign_shards(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in assign_shards(docs.repartition(13), "doc_id").collect()
    }
    assert a == b
    shards = {s for s, _ in a.values()}
    assert shards <= set(range(8)) and len(shards) == 8  # all shards populated


def test_shard_balance(spark, sf001):
    from collections import Counter

    from export_oltp_to_olap_spark.operators.sampling import assign_shards

    docs = _docs(spark, sf001)
    counts = Counter(r["shard"] for r in assign_shards(docs, "doc_id").collect())
    n = sum(counts.values())
    for c in counts.values():
        assert abs(c - n / 8) < 0.5 * (n / 8)  # within ±50% of uniform


def test_written_shards_stream_in_shuffled_order(spark, sf001, tmp_path):
    from export_oltp_to_olap_spark.operators.sampling import (
        assign_shards,
        write_training_shards,
    )

    docs = _docs(spark, sf001)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", n_shards=4)
    want = assign_shards(docs, "doc_id", n_shards=4)

    import glob

    import pyarrow.parquet as pq

    seen_total = 0
    expected = {
        r["doc_id"]: (r["shard"], r["pos"]) for r in want.collect()
    }
    for d in sorted(glob.glob(f"{path}/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        for f in sorted(glob.glob(f"{d}/*.parquet")):
            t = pq.read_table(f, columns=["doc_id", "pos"])
            ids = t.column("doc_id").to_pylist()
            poss = t.column("pos").to_pylist()
            assert poss == sorted(poss), "file rows not in shuffle order"
            for i in ids:
                assert expected[i][0] == shard
            seen_total += len(ids)
    assert seen_total == len(expected)


def test_epoch_allocation_never_overshoots_at_any_weight_rounding(spark):
    """Many-source corpus where the 6-dp-rounded weights sum past 1.0:
    without the remainder clamp the floored targets would exceed the
    budget; with it the plan is exact.  19 near-equal sources make
    each weight round independently, maximizing Σweights drift."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from export_oltp_to_olap_spark.operators.sampling import epoch_allocation

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    rows = []
    doc = 0
    for s in range(19):
        for _ in range(3 + s % 4):
            rows.append((doc, f"src{s:02d}", "word " * (97 + 13 * s % 29)))
            doc += 1
    out = epoch_allocation(
        spark.createDataFrame(rows, schema), budget_tenths=17
    ).collect()
    total = sum(r["tokens"] for r in out)
    budget = 17 * total // 10
    assert sum(r["target_tokens"] for r in out) == budget
    assert all(r["target_tokens"] >= 0 for r in out)
