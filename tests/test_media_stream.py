"""Streaming media exact dedup ≡ batch keeper ledger on the same items,
with planted cross-batch byte-exact duplicates (the fixture corpus has
none, so the dedup path must be exercised with crafted copies)."""

from __future__ import annotations

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.multimodal import media as M
from export_oltp_to_olap_spark.streaming.media_stream import (
    streaming_media_exact_dedup,
    streaming_media_neardup,
)


def test_streaming_media_exact_dedup_matches_batch(spark, sf001, tmp_path):
    docs = (
        spark.read.parquet(f"{sf001}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") <= 60)
    )
    # Plant byte-exact copies with HIGHER ids (append-only convention):
    # each copies the text of doc_id 1..6, so cross-batch duplicate
    # groups really form.
    originals = {r.doc_id: r.text for r in docs.where(F.col("doc_id") <= 6).collect()}
    copies = [(1000 + i, originals[i]) for i in sorted(originals)]
    all_docs = docs.unionByName(
        spark.createDataFrame(copies, "doc_id long, text string")
    )
    media_rows = M.synthesize_media(all_docs).collect()

    # Batch truth (drop n_copies: arrival-time emission cannot know it).
    batch = {
        (r.media_id, r.content_sha, r.canonical_id)
        for r in M.media_exact_dedup(all_docs).collect()
    }
    assert any(m != c for m, _, c in batch), "no planted duplicate groups?"

    # Stream in three id-ordered batches (monotone ids across batches).
    media_rows.sort(key=lambda r: r.media_id)
    feed = tmp_path / "feed"
    feed.mkdir()
    chunks = [media_rows[:30], media_rows[30:55], media_rows[55:]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, M.MEDIA_SCHEMA).coalesce(1).write.parquet(
            str(feed / f"b{i}")
        )
    stream = (
        spark.readStream.schema(M.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed) + "/*")
    )
    emitted: set[tuple] = set()

    def sink(batch_df, _):
        for r in batch_df.collect():
            emitted.add((r.media_id, r.content_sha, r.canonical_id))

    q = (
        streaming_media_exact_dedup(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert emitted == batch


def test_streaming_media_neardup_matches_batch(spark, sf001, tmp_path):
    """Stream ≡ batch near-dup pair set on any batch slicing, with
    planted CROSS-BATCH near-dups (VERDICT r9 item 3): perturbed copies
    land two triggers after their originals, so qualifying pairs only
    exist if cell state persists across micro-batches.  Stream emits a
    pair once per shared combo cell (at-least-once); the comparison
    dedups, like the text-face equivalence test."""
    docs = (
        spark.read.parquet(f"{sf001}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") <= 60)
    )
    # Perturbed copies with HIGHER ids: replace 8 occurrences of one
    # letter (byte-histogram L1 = 16 ≤ 24, size unchanged).  Copy ids
    # keep doc_id % 3 (synthesize_media's kind assignment) so each
    # pair shares a kind.
    originals = {r.doc_id: r.text for r in docs.where(F.col("doc_id") <= 6).collect()}
    copies = []
    for i, text in sorted(originals.items()):
        ch = next(c for c in "etaoins" if text.count(c) >= 8)
        copies.append((999 + i, text.replace(ch, "z", 8)))
    all_docs = docs.unionByName(
        spark.createDataFrame(copies, "doc_id long, text string")
    )

    batch = {
        (r.media_id_a, r.media_id_b, r.l1_dist)
        for r in M.media_histogram_neardup(all_docs).collect()
    }
    planted = {(i, 999 + i) for i in originals}
    assert planted <= {(a, b) for a, b, _ in batch}, "planted pairs not in batch truth"

    media_rows = sorted(
        M.synthesize_media(all_docs).collect(), key=lambda r: r.media_id
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, chunk in enumerate(
        [media_rows[:30], media_rows[30:55], media_rows[55:]]
    ):
        spark.createDataFrame(chunk, M.MEDIA_SCHEMA).coalesce(1).write.parquet(
            str(feed / f"b{i}")
        )
    stream = (
        spark.readStream.schema(M.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed) + "/*")
    )
    emitted: set[tuple] = set()

    def sink(batch_df, _):
        for r in batch_df.collect():
            emitted.add((r.media_id_a, r.media_id_b, r.l1_dist))

    q = (
        streaming_media_neardup(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert emitted == batch


def test_streaming_media_neardup_cap_trades_recall_not_precision(spark, sf001, tmp_path):
    """With a 1-member FIFO retention window every emitted pair must
    still be a true near-dup (precision intact); recall may drop."""
    docs = (
        spark.read.parquet(f"{sf001}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") <= 30)
    )
    originals = {r.doc_id: r.text for r in docs.where(F.col("doc_id") <= 6).collect()}
    copies = []
    for i, text in sorted(originals.items()):
        ch = next(c for c in "etaoins" if text.count(c) >= 8)
        copies.append((999 + i, text.replace(ch, "z", 8)))
    all_docs = docs.unionByName(
        spark.createDataFrame(copies, "doc_id long, text string")
    )
    batch = {
        (r.media_id_a, r.media_id_b, r.l1_dist)
        for r in M.media_histogram_neardup(all_docs).collect()
    }
    media_rows = sorted(
        M.synthesize_media(all_docs).collect(), key=lambda r: r.media_id
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    spark.createDataFrame(media_rows, M.MEDIA_SCHEMA).coalesce(1).write.parquet(
        str(feed / "b0")
    )
    stream = spark.readStream.schema(M.MEDIA_SCHEMA).parquet(str(feed) + "/*")
    emitted: set[tuple] = set()

    def sink(batch_df, _):
        for r in batch_df.collect():
            emitted.add((r.media_id_a, r.media_id_b, r.l1_dist))

    q = (
        streaming_media_neardup(stream, max_members_per_cell=1)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert emitted <= batch  # precision: nothing false under the cap
