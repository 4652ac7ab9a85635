"""The stateless round-4 text ops (chunking, PII scan) are streaming-
safe as-is: pure map-side plans run unchanged on a readStream source
and emit exactly the batch result for any micro-batch slicing."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from export_oltp_to_olap_spark.operators.chunking import chunk_documents
from export_oltp_to_olap_spark.plans.text_queries import pii_scan
from export_oltp_to_olap_spark.sources.parquet import load_tables

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _feed(tmp_path, rows):
    feed = tmp_path / "feed"
    feed.mkdir()
    chunks = [rows[:77], rows[77:200], rows[200:]]
    for i, chunk in enumerate(chunks):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    return feed


def _drain(df, ckpt):
    out = []
    q = (
        df.writeStream.outputMode("append")
        .foreachBatch(lambda b, _: out.extend(b.collect()))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_chunking_and_pii_stream_equals_batch(spark, sf001, tmp_path):
    docs = load_tables(spark, sf001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    feed = _feed(tmp_path, rows)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )

    got_chunks = {
        (r["doc_id"], r["chunk_index"]): (r["n_tokens"], r["chunk_fp"])
        for r in _drain(chunk_documents(stream), tmp_path / "ck1")
    }
    want_chunks = {
        (r["doc_id"], r["chunk_index"]): (r["n_tokens"], r["chunk_fp"])
        for r in chunk_documents(docs).collect()
    }
    assert got_chunks == want_chunks

    got_pii = {r["doc_id"]: tuple(r) for r in _drain(pii_scan(stream), tmp_path / "ck2")}
    want_pii = {r["doc_id"]: tuple(r) for r in pii_scan(docs).collect()}
    assert got_pii == want_pii


def test_rule_filters_stream_equals_batch(spark, sf001, tmp_path):
    """The Gopher and C4 rule gates are pure map plans (ordered=False
    drops the presentation sort, illegal on a stream): run at ingest
    they emit exactly the batch flags for any micro-batch slicing —
    the quality-gate-at-ingest claim."""
    from export_oltp_to_olap_spark.plans.text_queries import (
        c4_quality_flags,
        gopher_quality_flags,
    )

    docs = load_tables(spark, sf001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    feed = _feed(tmp_path, rows)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    got_g = {tuple(r) for r in _drain(gopher_quality_flags(stream, ordered=False), tmp_path / "ckg")}
    want_g = {tuple(r) for r in gopher_quality_flags(docs).collect()}
    assert got_g == want_g
    got_c = {tuple(r) for r in _drain(c4_quality_flags(stream, ordered=False), tmp_path / "ckc")}
    want_c = {tuple(r) for r in c4_quality_flags(docs).collect()}
    assert got_c == want_c


def test_shard_assignment_streams_equals_batch(spark, sf001, tmp_path):
    """`assign_shards` is a pure map-side hash of the row key, so
    routing arriving docs to training shards ONLINE (writeStream
    partitionBy(shard) is the sink form) assigns exactly the batch
    shard and position for any micro-batch slicing."""
    from export_oltp_to_olap_spark.operators.sampling import assign_shards

    docs = load_tables(spark, sf001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    feed = _feed(tmp_path, rows)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in _drain(
            assign_shards(stream, "doc_id").select("doc_id", "shard", "pos"),
            tmp_path / "cks",
        )
    }
    want = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in assign_shards(docs, "doc_id").select("doc_id", "shard", "pos").collect()
    }
    assert got == want


def test_c4_line_rewrite_streams_equals_batch(spark, tmp_path):
    """The C4 line-REWRITE face is the same pure map plan as the flags
    gate (ordered=False drops the presentation sort), so rewrite-at-
    ingest emits exactly the batch cleaned text for any micro-batch
    slicing — the last streaming asymmetry in the curation surface
    (VERDICT r10 item 5).  The fixture corpus keeps zero lines, so the
    feed is the crafted multi-line corpus the batch face is pinned on."""
    from tests.test_round10_ops import _CRAFTED

    from export_oltp_to_olap_spark.plans.text_queries import c4_line_filter

    rows = [{"doc_id": d, "text": t} for d, t, *_ in _CRAFTED]
    feed = tmp_path / "feed_c4"
    feed.mkdir()
    for i, chunk in enumerate((rows[:3], rows[3:5], rows[5:])):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], DOC_SCHEMA
    )
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    got = {tuple(r) for r in _drain(c4_line_filter(stream, ordered=False), tmp_path / "ckc4")}
    want = {tuple(r) for r in c4_line_filter(docs).collect()}
    assert got == want and len(want) == 2
