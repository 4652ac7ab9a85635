"""Streaming SemDeDup ≡ batch SemDeDup when the stream arrives in id
order, regardless of micro-batch slicing; replays change nothing."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from export_oltp_to_olap_spark.operators.semdedup import semantic_dedup
from export_oltp_to_olap_spark.sources.parquet import load_tables
from export_oltp_to_olap_spark.streaming.semdedup_stream import (
    streaming_semantic_dedup,
)

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def test_streaming_semdedup_matches_batch(spark, sf001, tmp_path):
    emb = load_tables(spark, sf001, ("embeddings",))["embeddings"].select(
        "vec_id", "embedding"
    )
    batch = {
        r["vec_id"]: (r["cluster_id"], r["kept"], r["dup_cos"])
        for r in semantic_dedup(emb).collect()
    }
    assert any(not kept for _, kept, _ in batch.values()), "no dups — vacuous"

    # The batch "first" centroid snapshot: the 16 lowest-id vectors.
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    centroids = [(r["vec_id"], list(r["embedding"])) for r in rows[:16]]

    # Stream in id order over three uneven micro-batches + a replay of
    # the first chunk (known members must not re-emit or flip state).
    feed = tmp_path / "feed"
    feed.mkdir()
    chunks = [rows[:200], rows[200:350], rows[350:], rows[:50]]
    for i, chunk in enumerate(chunks):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                    )
                    + "\n"
                )

    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    emitted: dict[int, tuple] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            assert r["vec_id"] not in emitted, "replay re-emitted a decision"
            emitted[r["vec_id"]] = (r["cluster_id"], r["kept"], r["dup_cos"])

    q = (
        streaming_semantic_dedup(stream, centroids)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert set(emitted) == set(batch)
    mismatches = {
        v: (emitted[v], batch[v]) for v in batch if emitted[v] != batch[v]
    }
    assert not mismatches, f"{len(mismatches)} divergent decisions: {list(mismatches.items())[:5]}"


def test_streaming_semdedup_state_cap_keeps_first_members(spark, tmp_path):
    """max_members_per_cluster=N retains only each cluster's FIRST N
    members as witnesses: a later vector's duplicate of a post-cap
    (unstored) vector is KEPT — bounded state, recall loss, never a
    false drop.  Uncapped run on the same feed drops it."""
    centroids = [(0, [1.0, 0.0])]
    vecs = [
        (1, [1.0, 0.0]),     # kept, stored
        (2, [0.6, 0.8]),     # cos v1 = 0.6 < 0.9 -> kept, stored (cap reached)
        (3, [0.0, 1.0]),     # cos v1 = 0, v2 = 0.8 -> kept, NOT stored
        (4, [0.001, 1.0]),   # ~= v3: dup of an unstored witness
    ]
    for cap, expect_v4_kept in [(2, True), (None, False)]:
        feed = tmp_path / f"feed_{cap}"
        feed.mkdir()
        import os

        for i, row in enumerate(vecs):
            with open(feed / f"b{i}.json", "w") as f:
                f.write(json.dumps({"vec_id": row[0], "embedding": row[1]}) + "\n")
            # mtime orders the micro-batches (same-ms writes are arbitrary)
            os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema(EMB_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(feed))
        )
        decisions = {}

        def sink(batch_df, _):
            for r in batch_df.collect():
                decisions[r["vec_id"]] = r["kept"]

        q = (
            streaming_semantic_dedup(
                stream, centroids, threshold=0.9, max_members_per_cluster=cap
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{cap}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert decisions[1] and decisions[2] and decisions[3]
        assert decisions[4] == expect_v4_kept, f"cap={cap}"
