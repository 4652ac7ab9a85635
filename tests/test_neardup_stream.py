"""Streaming MinHash-LSH near-dup ≡ batch pipeline on the same corpus,
regardless of how the stream is split into micro-batches."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from export_oltp_to_olap_spark.operators.neardup import minhash_lsh_neardup
from export_oltp_to_olap_spark.sources.parquet import load_tables
from export_oltp_to_olap_spark.streaming.neardup_stream import streaming_minhash_neardup

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def test_streaming_neardup_matches_batch(spark, sf001, tmp_path):
    docs = load_tables(spark, sf001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    rows = docs.collect()

    # Batch truth on the identical corpus.
    batch_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_neardup(docs).collect()
    }
    assert batch_pairs, "fixture corpus should contain near-dup pairs"

    # Stream the same docs in three uneven micro-batches.
    feed = tmp_path / "feed"
    feed.mkdir()
    chunks = [rows[:100], rows[100:150], rows[150:]]
    for i, chunk in enumerate(chunks):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    emitted: dict[tuple[int, int], float] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            key = (r["doc_a"], r["doc_b"])
            # at-least-once per colliding band: values must agree
            assert emitted.get(key, r["jaccard"]) == r["jaccard"]
            emitted[key] = r["jaccard"]

    q = (
        streaming_minhash_neardup(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert emitted == batch_pairs


def test_streaming_neardup_bucket_cap_is_sliding_window(spark, tmp_path):
    """max_members_per_bucket=1 keeps only each bucket's newest member:
    three identical docs arriving in separate batches pair only
    consecutively ((1,2),(2,3)) — the (1,3) pair is lost to eviction,
    proving the index plateaued at one member per bucket."""
    text = "the quick brown fox jumps over the lazy dog tonight"
    feed = tmp_path / "feed"
    feed.mkdir()
    import os

    for i, did in enumerate([1, 2, 3]):
        with open(feed / f"b{i}.json", "w") as f:
            f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        # mtime orders the micro-batches (same-ms writes are arbitrary)
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    pairs = set()

    def sink(batch_df, _):
        pairs.update((r["doc_a"], r["doc_b"]) for r in batch_df.collect())

    q = (
        streaming_minhash_neardup(stream, max_members_per_bucket=1)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert pairs == {(1, 2), (2, 3)}
