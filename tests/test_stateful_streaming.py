"""applyInPandasWithState: cross-batch state survives micro-batch splits
and totals match the batch aggregation exactly."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from export_oltp_to_olap_spark.streaming.stateful import (
    cents_half_up,
    running_user_totals,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_running_totals_across_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    batch1 = [(1, 10.25), (1, 0.75), (2, 5.5)]
    batch2 = [(1, 1.0), (3, 2.25), (2, 0.5), (2, 1.0)]
    for fname, rows in [("b1.json", batch1), ("b2.json", batch2)]:
        with open(feed / fname, "w") as f:
            for uid, val in rows:
                f.write(
                    json.dumps(
                        {"user_id": uid, "value": val, "ts": "2026-01-01 00:00:00"}
                    )
                    + "\n"
                )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    latest: dict[int, tuple[int, int]] = {}
    n_batches = []

    def sink(batch_df, batch_id):
        n_batches.append(batch_id)
        for r in batch_df.collect():
            latest[r["user_id"]] = (r["n_events"], r["total_cents"])

    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(n_batches) >= 2, "maxFilesPerTrigger=1 should yield 2+ batches"
    all_rows = batch1 + batch2
    expected = {}
    for uid, val in all_rows:
        n, cents = expected.get(uid, (0, 0))
        expected[uid] = (n + 1, cents + round(val * 100))
    assert latest == expected


def test_cents_rounding_matches_batch_rollup(spark):
    """The streaming accumulator and the batch rollup (Spark F.round,
    HALF_UP) must agree on exact half-cents — numpy/pandas .round() is
    half-to-even and would disagree on 0.125 etc. (VERDICT r2 item 5)."""
    values = [0.125, 0.135, 1.005, 2.675, -0.125, 10.0, 0.994999]
    df = spark.createDataFrame([(v,) for v in values], "value double")
    spark_cents = df.select(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
    ).first()["c"]
    assert cents_half_up(values) == spark_cents
    # And the specific half-to-even disagreement is real: 0.125 must be 13.
    assert cents_half_up([0.125]) == 13

def test_streaming_exact_dedup_first_seen_wins(spark, tmp_path):
    """Dups are dropped in-batch AND across micro-batches; each distinct
    text is emitted exactly once, keyed by its first-seen doc_id."""
    feed = tmp_path / "docs"
    feed.mkdir()
    b1 = [(1, "alpha"), (2, "beta"), (3, "alpha")]          # in-batch dup
    b2 = [(4, "beta"), (5, "gamma"), (6, "alpha"), (7, "gamma")]  # cross-batch dups
    for fname, rows in [("b1.json", b1), ("b2.json", b2)]:
        with open(feed / fname, "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
        .withColumn("fp", F.md5("text"))
        .select("doc_id", "fp")
    )
    from export_oltp_to_olap_spark.streaming.stateful import streaming_exact_dedup

    emitted = []

    def sink(batch_df, _):
        emitted.extend((r["doc_id"], r["fp"]) for r in batch_df.collect())

    q = (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert sorted(emitted) == sorted(
        [(1, md5("alpha")), (2, md5("beta")), (5, md5("gamma"))]
    )


def test_streaming_exact_dedup_state_plateaus_under_eviction(spark, tmp_path):
    """With max_state_per_bucket=N the seen-set is a FIFO retention
    window: dups of RETAINED fingerprints are still dropped
    (first-seen-wins within the window), while a fingerprint's
    re-emission after N fresh arrivals proves the state actually evicted
    (size plateaued at N) rather than growing without bound."""
    from export_oltp_to_olap_spark.streaming.stateful import streaming_exact_dedup

    feed = tmp_path / "docs"
    feed.mkdir()
    # All fps share the "aa" prefix => one state bucket, cap observable.
    batches = [
        [(1, "aa1"), (2, "aa2")],  # fill the window
        [(3, "aa3")],              # evicts aa1
        [(4, "aa2"), (5, "aa1")],  # aa2 retained -> drop; aa1 evicted -> re-emit
        [(6, "aa3"), (7, "aa2")],  # aa3 retained -> drop; aa2 evicted -> re-emit
    ]
    import os

    for i, rows in enumerate(batches):
        with open(feed / f"b{i}.json", "w") as f:
            for did, fp in rows:
                f.write(json.dumps({"doc_id": did, "fp": fp}) + "\n")
        # The file source orders batches by mtime; same-millisecond writes
        # would arrive in arbitrary order.
        os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("fp", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    emitted = []

    def sink(batch_df, _):
        emitted.extend((r["doc_id"], r["fp"]) for r in batch_df.collect())

    q = (
        streaming_exact_dedup(stream, max_state_per_bucket=2)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert sorted(emitted) == [
        (1, "aa1"),
        (2, "aa2"),
        (3, "aa3"),
        (5, "aa1"),  # evicted fp re-admitted: state is bounded
        (7, "aa2"),
    ]
