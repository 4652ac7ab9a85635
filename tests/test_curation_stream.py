"""Streaming curation ≡ batch gates + exact dedup on the same corpus,
for any micro-batch slicing of an id-ordered feed."""

from __future__ import annotations

import pytest
import json
import os

from pyspark.sql import types as T

from export_oltp_to_olap_spark.operators.sampling import assign_splits
from export_oltp_to_olap_spark.plans.curation import curated_docs
from export_oltp_to_olap_spark.sources.parquet import load_tables
from export_oltp_to_olap_spark.streaming.curation_stream import streaming_curated_docs

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


pytestmark = pytest.mark.slow  # streaming/robustness sweep tier (see pytest.ini)


def test_streaming_curation_matches_batch(spark, sf0001, tmp_path):
    docs = load_tables(spark, sf0001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    batch_kept = curated_docs(docs, checkpoint=False)
    want = {
        r["doc_id"]: r["split"]
        for r in assign_splits(batch_kept, "doc_id").select("doc_id", "split").collect()
    }
    assert want, "batch curation admitted nothing — vacuous"
    assert len(want) < docs.count(), "gates rejected nothing — vacuous"

    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    feed = tmp_path / "feed"
    feed.mkdir()
    chunks = [rows[:40], rows[40:45], rows[45:]]
    for i, chunk in enumerate(chunks):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    admitted: dict[int, str] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            assert r["doc_id"] not in admitted, "document admitted twice"
            admitted[r["doc_id"]] = r["split"]

    q = (
        streaming_curated_docs(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert admitted == want


def test_streaming_curation_with_decontamination_gate(spark, sf0001, tmp_path):
    """With a static eval corpus, the online gate rejects exactly the
    docs the batch contamination join would flag — for any slicing."""
    from pyspark.sql import functions as F

    from export_oltp_to_olap_spark.operators.decontam import contamination_hits

    docs = load_tables(spark, sf0001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    # eval set: a handful of real corpus docs → guaranteed n-gram overlap
    eval_docs = docs.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    batch_kept = curated_docs(docs, checkpoint=False)
    contaminated = {
        r["doc_id"] for r in contamination_hits(batch_kept, eval_docs).collect()
    }
    assert contaminated, "eval set overlaps nothing — vacuous"
    want = {
        r["doc_id"]: r["split"]
        for r in assign_splits(batch_kept, "doc_id").select("doc_id", "split").collect()
        if r["doc_id"] not in contaminated
    }
    assert want and len(want) < batch_kept.count()

    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, chunk in enumerate([rows[:100], rows[100:150], rows[150:]]):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    admitted: dict[int, str] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            assert r["doc_id"] not in admitted
            admitted[r["doc_id"]] = r["split"]

    q = (
        streaming_curated_docs(stream, eval_docs=eval_docs)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert admitted == want


def test_streaming_curation_with_lm_fluency_gate(spark, sf0001, tmp_path):
    """With a static reference-corpus LM, the online fluency gate admits
    exactly the docs whose batch `lm_score_docs` score clears the bar —
    for any slicing (the per-row scorer ≡ batch-join scorer contract)."""
    from pyspark.sql import functions as F

    from export_oltp_to_olap_spark.operators import lm

    docs = load_tables(spark, sf0001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    ref = docs.where(F.col("doc_id") % 3 == 0)  # static "good text" corpus
    model_arrays = lm.model_count_arrays(ref)

    batch_kept = curated_docs(docs, checkpoint=False)
    lm_min = 3.0
    batch_scores = {
        r["doc_id"]: r["score"]
        for r in lm.lm_score_docs(batch_kept, lm.train_gram_model(ref)).collect()
    }
    want = {
        r["doc_id"]: r["split"]
        for r in assign_splits(batch_kept, "doc_id").select("doc_id", "split").collect()
        if batch_scores.get(r["doc_id"], -1.0) >= lm_min
    }
    n_gated = batch_kept.count() - len(want)
    assert want and n_gated > 0, f"lm gate vacuous (rejects {n_gated})"

    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    feed = tmp_path / "feed_lm"
    feed.mkdir()
    for i, chunk in enumerate([rows[:70], rows[70:140], rows[140:]]):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    admitted: dict[int, str] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            assert r["doc_id"] not in admitted
            admitted[r["doc_id"]] = r["split"]

    q = (
        streaming_curated_docs(stream, lm_model=model_arrays, lm_min=lm_min)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_lm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert admitted == want


def test_incremental_leakage_safe_splits_match_batch(spark, sf0001, tmp_path):
    """Cluster-keyed split assignment at ingest (VERDICT r4 item 7):
    each micro-batch's (doc_id, canonical_id, split) must equal the
    FULL batch closure over everything seen so far, restricted to the
    batch ids — i.e. delta docs join standing families (inheriting the
    family's canonical id and split) and new families mint canonical
    ids exactly as the rebuild would."""
    from export_oltp_to_olap_spark.operators.neardup import (
        minhash_neardup_clusters,
    )
    from export_oltp_to_olap_spark.streaming.curation_stream import (
        leakage_safe_split_sink,
    )

    docs = load_tables(spark, sf0001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    chunks = [rows[:40], rows[40:45], rows[45:]]

    feed = tmp_path / "feed"
    feed.mkdir()
    for i, chunk in enumerate(chunks):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    emitted: list[dict[int, tuple[int, str]]] = []

    def emit(df):
        emitted.append(
            {r["doc_id"]: (r["canonical_id"], r["split"]) for r in df.collect()}
        )

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    q = (
        stream.writeStream.foreachBatch(leakage_safe_split_sink(emit))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(emitted) == len(chunks)

    seen: list = []
    cross_family = 0
    for chunk, got in zip(chunks, emitted):
        seen.extend(chunk)
        prefix = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in seen], "doc_id long, text string"
        )
        rebuilt = assign_splits(
            minhash_neardup_clusters(prefix).select("doc_id", "canonical_id"),
            "canonical_id",
        )
        chunk_ids = {r["doc_id"] for r in chunk}
        want = {
            r["doc_id"]: (r["canonical_id"], r["split"])
            for r in rebuilt.collect()
            if r["doc_id"] in chunk_ids
        }
        assert got == want, "incremental assignment diverged from rebuild"
        cross_family += sum(1 for d, (c, _) in got.items() if c != d)
    assert cross_family > 0, (
        "no batch doc ever joined an existing family — the fixture slicing "
        "makes the equivalence vacuous; re-cut the chunks"
    )


def test_leakage_safe_split_sink_survives_checkpoint_restart(spark, sf0001, tmp_path):
    """The table-backed standing state (VERDICT r6 item 6): run two
    micro-batches with `state_dir` set, KILL the query, construct a
    FRESH sink (new process ≙ new closure) over the same state_dir and
    restart from the same checkpoint with a third file — the reloaded
    standing map must make every batch's assignment equal the full
    rebuild over everything seen so far, including cross-family joins
    into pre-restart families (which an empty post-restart map would
    get wrong)."""
    from export_oltp_to_olap_spark.operators.neardup import (
        minhash_neardup_clusters,
    )
    from export_oltp_to_olap_spark.streaming.curation_stream import (
        leakage_safe_split_sink,
    )

    docs = load_tables(spark, sf0001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    chunks = [rows[:40], rows[40:45], rows[45:]]

    feed = tmp_path / "feed"
    feed.mkdir()
    state_dir = str(tmp_path / "split_state")
    ckpt = str(tmp_path / "ckpt")

    def write_chunk(i, chunk):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    emitted: list[dict[int, tuple[int, str]]] = []

    def emit(df):
        emitted.append(
            {r["doc_id"]: (r["canonical_id"], r["split"]) for r in df.collect()}
        )

    def run_once():
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(feed))
        )
        q = (
            stream.writeStream.foreachBatch(
                leakage_safe_split_sink(emit, state_dir=state_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_chunk(0, chunks[0])
    write_chunk(1, chunks[1])
    run_once()  # first incarnation: folds batches 0 and 1, then stops
    assert len(emitted) == 2
    write_chunk(2, chunks[2])
    run_once()  # FRESH sink closure + same checkpoint: only batch 2 runs
    assert len(emitted) == 3

    seen: list = []
    post_restart_joins = 0
    for i, (chunk, got) in enumerate(zip(chunks, emitted)):
        seen.extend(chunk)
        prefix = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in seen], "doc_id long, text string"
        )
        rebuilt = assign_splits(
            minhash_neardup_clusters(prefix).select("doc_id", "canonical_id"),
            "canonical_id",
        )
        chunk_ids = {r["doc_id"] for r in chunk}
        want = {
            r["doc_id"]: (r["canonical_id"], r["split"])
            for r in rebuilt.collect()
            if r["doc_id"] in chunk_ids
        }
        assert got == want, f"batch {i} diverged from rebuild after restart"
        if i == 2:
            post_restart_joins = sum(
                1 for d, (c, _) in got.items() if c != d and c not in chunk_ids
            )
    assert post_restart_joins > 0, (
        "no post-restart doc joined a pre-restart family — the restart "
        "equivalence is vacuous; re-cut the chunks"
    )
