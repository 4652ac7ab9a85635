"""Watermark semantics: in-delay late events counted, beyond-delay dropped,
windows finalized exactly once (append mode).

The file source's watermark advances with 1-2 batches of lag, so the
too-late event is scheduled several batches after the advancing event —
the drop is then unambiguous for any lag ≤ 2.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from export_oltp_to_olap_spark.streaming.windows import windowed_event_counts

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _write(feed, name, rows, order: int):
    """One feed file per micro-batch, with a distinct increasing mtime —
    the file source orders batches by modification time, and
    same-millisecond writes would make watermark progression
    nondeterministic."""
    path = feed / name
    with open(path, "w") as f:
        for ts, et in rows:
            f.write(json.dumps({"ts": ts, "event_type": et}) + "\n")
    base = 1_700_000_000
    os.utime(path, (base + order, base + order))


def test_watermark_accepts_in_delay_late_and_drops_beyond(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # window 10:00 content: 10:05, 10:10, then 10:20 arriving one batch
    # late but within every possible watermark (wm ≤ 09:40 at that point)
    _write(feed, "b1.json", [("2026-01-01 10:05:00", "click"), ("2026-01-01 10:10:00", "click")], 1)
    _write(feed, "b2.json", [("2026-01-01 10:20:00", "click"), ("2026-01-01 12:00:00", "click")], 2)
    # advance event time well past the 10:00 window across several batches
    _write(feed, "b3.json", [("2026-01-01 13:00:00", "click")], 3)
    _write(feed, "b4.json", [("2026-01-01 14:00:00", "click")], 4)
    # by now the watermark is ≥ 12:30 under any 1-2 batch lag → 10:30 is
    # beyond the 30-minute tolerance and must be dropped
    _write(feed, "b5.json", [("2026-01-01 10:30:00", "click")], 5)
    _write(feed, "b6.json", [("2026-01-01 16:00:00", "click")], 6)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(feed))
    )
    finalized: dict[str, int] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            key = str(r["window_start"])
            assert key not in finalized, "append mode must emit each window once"
            finalized[key] = r["n_events"]

    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # the 10:00 window must have finalized and counted exactly the three
    # in-watermark events — the beyond-watermark 10:30 must be absent
    assert finalized["2026-01-01 10:00:00"] == 3, finalized
    # anything else that finalized must match the true per-window counts
    truth = {
        "2026-01-01 12:00:00": 1,
        "2026-01-01 13:00:00": 1,
        "2026-01-01 14:00:00": 1,
        "2026-01-01 16:00:00": 1,
    }
    for key, n in finalized.items():
        if key in truth:
            assert n == truth[key], finalized


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_session(feed, name, rows, order: int):
    path = feed / name
    with open(path, "w") as f:
        for ts, uid, val in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid, "value": val}) + "\n")
    base = 1_700_000_000
    os.utime(path, (base + order, base + order))


def test_session_window_merges_and_splits(spark, tmp_path):
    """Events within the gap merge into one session (even across
    micro-batches); a silence longer than the gap starts a new session."""
    from export_oltp_to_olap_spark.streaming.windows import session_event_stats

    feed = tmp_path / "feed"
    feed.mkdir()
    # user 1: 10:00 and 10:20 (within 30-min gap -> one session), then
    # 12:00 (after >30-min silence -> second session).  user 2: lone event.
    _write_session(feed, "b1.json", [("2026-01-01 10:00:00", 1, 1.0)], 1)
    _write_session(feed, "b2.json", [("2026-01-01 10:20:00", 1, 2.0), ("2026-01-01 10:00:00", 2, 5.0)], 2)
    _write_session(feed, "b3.json", [("2026-01-01 12:00:00", 1, 4.0)], 3)
    # advance event time so every session above is past the watermark
    _write_session(feed, "b4.json", [("2026-01-01 15:00:00", 9, 0.0)], 4)
    _write_session(feed, "b5.json", [("2026-01-01 16:00:00", 9, 0.0)], 5)
    _write_session(feed, "b6.json", [("2026-01-01 17:00:00", 9, 0.0)], 6)

    stream = (
        spark.readStream.schema(SESSION_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    out: dict[tuple, tuple] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            key = (r["user_id"], str(r["session_start"]))
            assert key not in out, "append mode must emit each session once"
            out[key] = (str(r["session_end"]), r["n_events"], r["total_value"])

    q = (
        session_event_stats(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # cross-batch merge: one session 10:00-10:50 (end = last event + gap)
    assert out[(1, "2026-01-01 10:00:00")] == ("2026-01-01 10:50:00", 2, 3.0), out
    # silence split: a separate session at 12:00
    assert out[(1, "2026-01-01 12:00:00")] == ("2026-01-01 12:30:00", 1, 4.0), out
    # lone-event session for user 2
    assert out[(2, "2026-01-01 10:00:00")] == ("2026-01-01 10:30:00", 1, 5.0), out


def test_dedup_within_watermark_drops_replays(spark, tmp_path):
    """An at-least-once feed replaying event_ids across micro-batches
    yields each event exactly once while inside the watermark."""
    import json as _json

    from export_oltp_to_olap_spark.streaming.windows import (
        dedup_events_within_watermark,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    b1 = [(1, "2026-01-01 10:00:00"), (2, "2026-01-01 10:00:05"),
          (1, "2026-01-01 10:00:00")]                      # in-batch replay
    b2 = [(2, "2026-01-01 10:00:05"), (3, "2026-01-01 10:00:10")]  # cross-batch replay
    for fname, rows in [("b1.json", b1), ("b2.json", b2)]:
        with open(feed / fname, "w") as f:
            for eid, ts in rows:
                f.write(_json.dumps({"event_id": eid, "ts": ts, "user_id": 1,
                                     "event_type": "view", "value": 1.0,
                                     "props": "{}"}) + "\n")
    dedup_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(dedup_schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    seen: list[int] = []

    def sink(batch_df, _):
        seen.extend(r["event_id"] for r in batch_df.collect())

    q = (
        dedup_events_within_watermark(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(seen) == [1, 2, 3]


def test_hopping_stream_equals_batch_twin(spark, tmp_path):
    """Hopping (1h/30min) watermarked counts: finalized windows must
    match the oracle-checked batch twin's counts for those windows."""
    from export_oltp_to_olap_spark.plans.events import hopping_halfhour_stats

    feed = tmp_path / "feed"
    feed.mkdir()
    rows1 = [("2026-01-01 10:05:00", "click"), ("2026-01-01 10:40:00", "click")]
    rows2 = [("2026-01-01 11:10:00", "view"), ("2026-01-01 13:00:00", "click")]
    rows3 = [("2026-01-01 15:00:00", "click")]
    _write(feed, "b1.json", rows1, 1)
    _write(feed, "b2.json", rows2, 2)
    _write(feed, "b3.json", rows3, 3)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(feed))
    )
    finalized: dict[tuple, int] = {}

    def sink(batch_df, _):
        for r in batch_df.collect():
            key = (str(r["window_start"]), r["event_type"])
            assert key not in finalized, "append mode must emit each window once"
            finalized[key] = r["n_events"]

    q = (
        windowed_event_counts(stream, slide="30 minutes")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    all_rows = [
        (i, r[0], r[1], 1.0) for i, r in enumerate(rows1 + rows2 + rows3)
    ]
    batch_events = spark.createDataFrame(
        all_rows, "event_id long, ts string, event_type string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "event_type", "value")
    want = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in hopping_halfhour_stats(batch_events).collect()
    }
    assert finalized, "no windows finalized"
    for key, n in finalized.items():
        assert want.get(key) == n, (key, n, want.get(key))
    # every event feeds two windows; the finalized subset is consistent
    assert all(k in want for k in finalized)
