"""transformWithStateInPandas dedup — semantics ≡ the v1 operator.

The Spark-4-native processor must reproduce `streaming_exact_dedup`'s
contract exactly: first arrival of each fingerprint emitted once, every
later copy dropped, within and across micro-batches, state surviving
through the checkpoint.  The last test runs BOTH operators over the
same feed and compares emitted sets — the migration guarantee.
"""

from __future__ import annotations

import json
import os

import pytest

# Spark's transformWithState Python<->JVM state protocol is
# protobuf-based; the sandbox image ships no google.protobuf, so these
# tests execute only on environments that have it (any real cluster).
# The operator's docstring declares the gate.
pytest.importorskip("google.protobuf")

from pyspark.sql import functions as F
from pyspark.sql import types as T

from export_oltp_to_olap_spark.streaming.stateful import streaming_exact_dedup
from export_oltp_to_olap_spark.streaming.stateful_v2 import streaming_exact_dedup_tws

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("fp", T.StringType())]
)

BATCHES = [
    [(1, "aa-alpha"), (2, "ab-beta"), (3, "aa-alpha")],  # in-batch dup
    [(4, "ab-beta"), (5, "ac-gamma"), (6, "aa-alpha"), (7, "ac-gamma")],
    [(8, "ad-delta"), (9, "ac-gamma")],
]
FIRST_SEEN = {("aa-alpha", 1), ("ab-beta", 2), ("ac-gamma", 5), ("ad-delta", 8)}


def _write_feed(feed):
    feed.mkdir()
    for i, rows in enumerate(BATCHES):
        with open(feed / f"b{i}.json", "w") as f:
            for did, fp in rows:
                f.write(json.dumps({"doc_id": did, "fp": fp}) + "\n")
        # file source orders batches by mtime
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))


ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


@pytest.fixture(autouse=True)
def _rocksdb_state_store(spark):
    """transformWithState requires the RocksDB state-store provider (the
    default HDFS-backed provider cannot serve typed state)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def _run(spark, feed, ckpt, op):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
        .select("doc_id", "fp")
    )
    emitted = []

    def sink(batch_df, _):
        emitted.extend((r["fp"], r["doc_id"]) for r in batch_df.collect())

    q = (
        op(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return emitted


def test_tws_dedup_first_seen_wins(spark, tmp_path):
    feed = tmp_path / "docs"
    _write_feed(feed)
    emitted = _run(spark, feed, tmp_path / "ckpt", streaming_exact_dedup_tws)
    assert set(emitted) == FIRST_SEEN
    assert len(emitted) == len(FIRST_SEEN)  # each exactly once


def test_tws_matches_v1_operator(spark, tmp_path):
    """Migration guarantee: old and new state APIs emit the same
    fingerprint SET.  Compared as fp sets, not (fp, doc_id) pairs: for
    bucket batches spanning multiple Arrow chunks, v1's in-batch winner
    is the per-chunk min (chunk-order-dependent) while v2 resolves the
    global batch min — dedup semantics agree, attribution can differ
    (ADVICE r7).  This tiny feed is single-chunk, so doc_ids happen to
    agree too, but the CONTRACT — and this assertion — is the fp set."""
    feed = tmp_path / "docs"
    _write_feed(feed)
    v1 = _run(spark, feed, tmp_path / "ckpt_v1", streaming_exact_dedup)
    v2 = _run(spark, feed, tmp_path / "ckpt_v2", streaming_exact_dedup_tws)
    assert {fp for _, fp in v1} == {fp for _, fp in v2} == {
        fp for _, fp in FIRST_SEEN
    }


def test_tws_state_survives_restart(spark, tmp_path):
    """Run the first two batches, stop, then feed the third through the
    SAME checkpoint: fingerprints seen before the restart stay dropped."""
    feed = tmp_path / "docs"
    feed.mkdir()
    for i, rows in enumerate(BATCHES[:2]):
        with open(feed / f"b{i}.json", "w") as f:
            for did, fp in rows:
                f.write(json.dumps({"doc_id": did, "fp": fp}) + "\n")
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    first = _run(spark, feed, tmp_path / "ckpt", streaming_exact_dedup_tws)
    with open(feed / "b2.json", "w") as f:
        for did, fp in BATCHES[2]:
            f.write(json.dumps({"doc_id": did, "fp": fp}) + "\n")
    os.utime(feed / "b2.json", (1_700_000_002, 1_700_000_002))
    second = _run(spark, feed, tmp_path / "ckpt", streaming_exact_dedup_tws)
    assert set(first) | set(second) == FIRST_SEEN
    # batch 3's ac-gamma copy (doc 9) was deduped against PRE-restart state
    assert ("ac-gamma", 9) not in set(second)
    assert ("ad-delta", 8) in set(second)
