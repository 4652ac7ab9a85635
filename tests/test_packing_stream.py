"""Streaming sequence packing ≡ batch pack_assignments for any
micro-batch slicing of an id-ordered feed; replayed rows are skipped."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from export_oltp_to_olap_spark.operators.chunking import pack_assignments
from export_oltp_to_olap_spark.sources.parquet import load_tables
from export_oltp_to_olap_spark.streaming.packing_stream import streaming_pack_assignments

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

WINDOW = 256
SHARDS = 2


def _feed(tmp_path, chunks):
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, chunk in enumerate(chunks):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {"doc_id": r["doc_id"], "source": r["source"], "text": r["text"]}
                    )
                    + "\n"
                )
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    return feed


def _run(spark, feed, ckpt):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    got: dict[int, tuple] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            assert r["doc_id"] not in got, "document packed twice"
            got[r["doc_id"]] = (r["source"], r["shard"], r["n_tokens"], r["start"], r["bin"])

    q = (
        streaming_pack_assignments(stream, window=WINDOW, shards=SHARDS)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def test_streaming_pack_matches_batch(spark, sf001, tmp_path):
    docs = load_tables(spark, sf001, ("documents",))["documents"].select(
        "doc_id", "source", "text"
    )
    want = {
        r["doc_id"]: (r["source"], r["shard"], r["n_tokens"], r["start"], r["bin"])
        for r in pack_assignments(docs, window=WINDOW, shards=SHARDS).collect()
    }
    assert len({v[4] for v in want.values()}) > 1, "fixture spans one bin — vacuous"

    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    feed = _feed(tmp_path, [rows[:111], rows[111:222], rows[222:]])
    got = _run(spark, feed, tmp_path / "ckpt")
    assert got == want


def test_streaming_pack_skips_replayed_rows(spark, sf001, tmp_path):
    docs = load_tables(spark, sf001, ("documents",))["documents"].select(
        "doc_id", "source", "text"
    )
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    # second file REPLAYS the tail of the first before advancing
    feed = _feed(
        tmp_path, [rows[:200], rows[150:200] + rows[200:300], rows[250:]]
    )
    got = _run(spark, feed, tmp_path / "ckpt")
    want = {
        r["doc_id"]: (r["source"], r["shard"], r["n_tokens"], r["start"], r["bin"])
        for r in pack_assignments(docs, window=WINDOW, shards=SHARDS).collect()
    }
    assert got == want  # replays emitted nothing and advanced no offsets
