"""Persisted IVF index: probe ≡ the one-shot operator, delta-append ≡
full rebuild under frozen centroids, partition pruning on the postings
scan, and the bounded-routing guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import ann_index, similarity
from export_oltp_to_olap_spark.sources.parquet import load_tables

N_CEN, NPROBE, N_QUERIES, K = 8, 3, 6, 5


@pytest.fixture(scope="module")
def emb(spark, sf001):
    return load_tables(spark, sf001, ("embeddings",))["embeddings"].select(
        "vec_id", "embedding"
    )


def _queries(emb, n=N_QUERIES):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_persisted_probe_equals_one_shot_operator(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, path, n_centroids=N_CEN, centroid_mode="first")
    got = ann_index.probe_ivf_index(spark, path, _queries(emb), nprobe=NPROBE, k=K)
    want = similarity.ivf_cosine_topk(
        emb, n_centroids=N_CEN, nprobe=NPROBE, n_queries=N_QUERIES, k=K
    )
    assert _rows(got) == _rows(want)


def test_delta_append_equals_full_rebuild(spark, emb, tmp_path):
    # A holds every centroid id (vec_id < N_CEN), so "first" centroids
    # are identical whether B is present at build time or appended.
    a = emb.where((F.col("vec_id") < N_CEN) | (F.col("vec_id") % 2 == 0))
    b = emb.where((F.col("vec_id") >= N_CEN) & (F.col("vec_id") % 2 == 1))

    inc = str(tmp_path / "inc")
    ann_index.build_ivf_index(a, inc, n_centroids=N_CEN, centroid_mode="first")
    ann_index.append_ivf_index(b, inc)

    full = str(tmp_path / "full")
    ann_index.build_ivf_index(emb, full, n_centroids=N_CEN, centroid_mode="first")

    q = _queries(emb)
    got = ann_index.probe_ivf_index(spark, inc, q, nprobe=NPROBE, k=K)
    want = ann_index.probe_ivf_index(spark, full, q, nprobe=NPROBE, k=K)
    assert _rows(got) == _rows(want)


def test_probe_scan_is_partition_pruned(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, path, n_centroids=N_CEN, centroid_mode="first")
    out = ann_index.probe_ivf_index(spark, path, _queries(emb), nprobe=NPROBE, k=K)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cen_id" in plan.replace("PartitionFilters: [ cen_id", "PartitionFilters: [cen_id"), plan[:2000]


def test_routing_guard_bounds_the_collect(spark, emb, tmp_path, monkeypatch):
    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, path, n_centroids=N_CEN, centroid_mode="first")
    monkeypatch.setattr(ann_index, "MAX_ROUTING_ROWS", 4)
    with pytest.raises(ValueError, match="routing table"):
        ann_index.probe_ivf_index(spark, path, _queries(emb), nprobe=NPROBE, k=K)


def test_append_works_as_stream_maintainer(spark, emb, tmp_path):
    """foreachBatch(append_ivf_index) maintains the persisted index from
    a vector stream: after the stream drains, probing equals a full
    rebuild over everything ingested (frozen-centroid convention)."""
    import json as _json
    import os

    path = str(tmp_path / "ivf")
    seed = emb.where(F.col("vec_id") < N_CEN)  # all centroid ids present
    ann_index.build_ivf_index(seed, path, n_centroids=N_CEN, centroid_mode="first")

    feed = tmp_path / "feed"
    feed.mkdir()
    rest = emb.where(F.col("vec_id") >= N_CEN).collect()
    half = len(rest) // 2
    for i, chunk in enumerate((rest[:half], rest[half:])):
        with open(feed / f"{i}.json", "w") as f:
            for r in chunk:
                f.write(_json.dumps({"vec_id": r["vec_id"], "embedding": list(r["embedding"])}) + "\n")
        os.utime(feed / f"{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _id: ann_index.append_ivf_index(batch, path)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = str(tmp_path / "full")
    ann_index.build_ivf_index(emb, full, n_centroids=N_CEN, centroid_mode="first")
    queries = _queries(emb)
    got = ann_index.probe_ivf_index(spark, path, queries, nprobe=NPROBE, k=K)
    want = ann_index.probe_ivf_index(spark, full, queries, nprobe=NPROBE, k=K)
    assert _rows(got) == _rows(want)


def test_append_casts_delta_to_stored_element_type(spark, emb, tmp_path):
    """A producer whose feed declares array<double> must not corrupt a
    float-built index: append_ivf_index casts to the postings schema, so
    every part file carries the stored element type and probes equal a
    full rebuild regardless of which footer the reader samples
    (regression: PARQUET_COLUMN_DATA_TYPE_MISMATCH, flaky in suite order)."""
    a = emb.where((F.col("vec_id") < N_CEN) | (F.col("vec_id") % 2 == 0))
    b = emb.where((F.col("vec_id") >= N_CEN) & (F.col("vec_id") % 2 == 1))

    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(a, path, n_centroids=N_CEN, centroid_mode="first")
    stored = dict(spark.read.parquet(f"{path}/postings").dtypes)["embedding"]

    drifted = b.withColumn("embedding", F.col("embedding").cast("array<double>"))
    ann_index.append_ivf_index(drifted, path)

    # Every part file must carry the stored element type — assert via a
    # full-directory read with schema merging, which would surface a
    # float/double mix as a conflict or a per-file mismatch on collect.
    merged = spark.read.option("mergeSchema", "true").parquet(f"{path}/postings")
    assert dict(merged.dtypes)["embedding"] == stored
    merged.collect()

    full = str(tmp_path / "full")
    ann_index.build_ivf_index(emb, full, n_centroids=N_CEN, centroid_mode="first")
    q = _queries(emb)
    got = ann_index.probe_ivf_index(spark, path, q, nprobe=NPROBE, k=K)
    want = ann_index.probe_ivf_index(spark, full, q, nprobe=NPROBE, k=K)
    assert _rows(got) == _rows(want)


def test_retract_equals_rebuild_over_survivors_frozen_centroids(
    spark, emb, tmp_path
):
    """Retract ≡ a fresh build over the survivors with the SAME frozen
    centroids: assignment is per-vector, so dropping vectors can move
    nothing else."""
    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, path, n_centroids=N_CEN, centroid_mode="first")
    deleted = emb.select("vec_id").where(F.col("vec_id") % 5 == 0)
    ann_index.retract_ivf_index(deleted, path)

    ref = str(tmp_path / "ref")
    survivors = emb.join(deleted, "vec_id", "left_anti")
    # same frozen centroid frame: first-N mode trains on the FULL set's
    # first rows, so rebuild the reference with the original centroids
    import shutil

    ann_index.build_ivf_index(emb, ref, n_centroids=N_CEN, centroid_mode="first")
    shutil.rmtree(f"{ref}/postings")
    cen = spark.read.parquet(f"{ref}/centroids")
    base = similarity.with_norm(survivors).select("vec_id", "embedding", "norm")
    (
        similarity.rank_centroids(base, cen)
        .where(F.col("cen_rank") == 1)
        .select("cen_id", "vec_id", "embedding", "norm")
        .repartition("cen_id")
        .write.partitionBy("cen_id")
        .parquet(f"{ref}/postings")
    )
    got = _rows(
        spark.read.parquet(f"{path}/postings").select("vec_id", "cen_id")
    )
    want = _rows(
        spark.read.parquet(f"{ref}/postings").select("vec_id", "cen_id")
    )
    assert got == want
    # and the retracted index still probes (deleted ids gone)
    out = ann_index.probe_ivf_index(
        spark, path, _queries(emb), nprobe=NPROBE, k=K
    )
    assert out.count() > 0
    gone = out.join(deleted.withColumnRenamed("vec_id", "neighbor_id"),
                    "neighbor_id").count()
    assert gone == 0


def test_retract_rewrites_only_affected_lists(spark, emb, tmp_path):
    """Partition-scoped copy-on-write: lists without a deleted member
    keep their exact part files; a fully-emptied list's directory is
    removed."""
    import glob
    import os

    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, path, n_centroids=N_CEN, centroid_mode="first")
    postings = spark.read.parquet(f"{path}/postings")
    # delete every member of ONE list, nothing else
    victim = postings.groupBy("cen_id").count().orderBy("count", "cen_id").first()
    victim_id = victim["cen_id"]
    deleted = postings.where(F.col("cen_id") == victim_id).select("vec_id")
    before = {
        cid: sorted(glob.glob(os.path.join(path, "postings", f"cen_id={cid}", "*")))
        for cid in range(N_CEN)
    }
    ann_index.retract_ivf_index(deleted, path)
    assert not os.path.isdir(os.path.join(path, "postings", f"cen_id={victim_id}"))
    for cid in range(N_CEN):
        if cid == victim_id:
            continue
        after = sorted(
            glob.glob(os.path.join(path, "postings", f"cen_id={cid}", "*"))
        )
        assert after == before[cid], f"untouched list {cid} was rewritten"
