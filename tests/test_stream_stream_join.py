"""Stream-stream attribution join: batch equivalence + late-data eviction.

Two file-fed streams (clicks, purchases) joined with watermarks and an
event-time range.  Test 1 feeds everything in arrival order with no
late data and asserts the emitted pair set equals the BATCH interval
join over the same rows (the oracle-checked twin's convention).  Test 2
schedules a click far behind the advanced watermark and asserts it
produces no pair — the bounded-state contract (old join state evicted,
late rows dropped).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from export_oltp_to_olap_spark.operators.rangejoin import interval_join
from export_oltp_to_olap_spark.streaming.joins import (
    stream_click_purchase_attribution,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write(feed, name, rows, order: int):
    path = feed / name
    with open(path, "w") as f:
        for eid, uid, ts in rows:
            f.write(json.dumps({"event_id": eid, "user_id": uid, "ts": ts}) + "\n")
    base = 1_700_000_000
    os.utime(path, (base + order, base + order))


def _run_stream(spark, clicks_feed, purchases_feed, tmp_path):
    clicks = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(clicks_feed))
    )
    purchases = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(purchases_feed))
    )
    out = stream_click_purchase_attribution(clicks, purchases)
    got: list[tuple] = []

    def sink(batch_df, _):
        got.extend(
            (r.purchase_id, r.click_id, r.micros_before_purchase)
            for r in batch_df.collect()
        )

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sorted(got)


def test_matches_batch_interval_join_without_late_data(spark, tmp_path):
    clicks_feed = tmp_path / "clicks"
    purchases_feed = tmp_path / "purchases"
    clicks_feed.mkdir()
    purchases_feed.mkdir()
    # 3 users, clicks every ~17 min, purchases on the half hour — several
    # clicks per purchase window, plus explicit boundary rows: a user-2
    # click at exactly purchase-1h (10:00 vs 11:00 — lower-INclusive,
    # must pair) and a user-1 click at exactly a purchase instant
    # (12:00 — upper-EXclusive, must not pair).  Both conventions are
    # asserted through the stream≡batch equivalence: a one-sided
    # regression (e.g. `<` → `<=`) breaks the set equality.
    clicks = [
        (100 + i, 1 + (i % 3), f"2026-01-01 10:{(i * 17) % 60:02d}:00")
        for i in range(12)
    ] + [
        (150, 2, "2026-01-01 10:00:00"),
        (151, 1, "2026-01-01 12:00:00"),
    ]
    purchases = [
        (200, 1, "2026-01-01 10:30:00"),
        (201, 2, "2026-01-01 11:00:00"),
        (202, 3, "2026-01-01 11:34:00"),
        (203, 1, "2026-01-01 12:00:00"),
    ]
    _write(clicks_feed, "c1.json", clicks[:6], 1)
    _write(clicks_feed, "c2.json", clicks[6:], 2)
    _write(purchases_feed, "p1.json", purchases[:2], 1)
    _write(purchases_feed, "p2.json", purchases[2:], 2)

    got = _run_stream(spark, clicks_feed, purchases_feed, tmp_path)

    cdf = spark.createDataFrame(
        [(e, u, ts) for e, u, ts in clicks], "event_id long, user_id long, ts string"
    ).select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").cast("timestamp"))
    pdf = spark.createDataFrame(
        purchases, "event_id long, user_id long, ts string"
    ).select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").cast("timestamp"))
    pairs = interval_join(
        pdf,
        cdf,
        on=["user_id"],
        ts_col="ts",
        lower_us=-3600 * 1_000_000,
        upper_us=0,
        right_cols=["click_id", "ts"],
    )
    want = sorted(
        (r.purchase_id, r.r_click_id, us)
        for r in pairs.collect()
        for us in [
            int((r.ts - r.r_ts).total_seconds() * 1_000_000)
        ]
    )
    assert got == want
    assert len(got) > 0
    # boundary rows resolved as documented, independent of the twin
    pair_keys = {(p, c) for p, c, _ in got}
    assert (201, 150) in pair_keys  # click at exactly purchase-1h pairs
    assert all(c != 151 for _, c in pair_keys)  # click at purchase instant never pairs


def test_click_behind_watermark_produces_no_pair(spark, tmp_path):
    clicks_feed = tmp_path / "clicks"
    purchases_feed = tmp_path / "purchases"
    clicks_feed.mkdir()
    purchases_feed.mkdir()
    # One user.  Early purchase at 10:30; watermark then advances hours
    # ahead on both streams; finally a click at 10:10 arrives — inside
    # the purchase's lookback but far behind the watermark (≥ 12:35
    # under any 1-2 batch lag), so it must be dropped and the purchase's
    # state must already be evicted.
    _write(purchases_feed, "p1.json", [(200, 1, "2026-01-01 10:30:00")], 1)
    _write(purchases_feed, "p2.json", [(201, 1, "2026-01-01 13:05:00")], 2)
    _write(purchases_feed, "p3.json", [(202, 1, "2026-01-01 15:05:00")], 3)
    _write(purchases_feed, "p4.json", [(203, 1, "2026-01-01 17:05:00")], 4)
    _write(clicks_feed, "c1.json", [(100, 1, "2026-01-01 13:00:00")], 1)
    _write(clicks_feed, "c2.json", [(101, 1, "2026-01-01 15:00:00")], 2)
    _write(clicks_feed, "c3.json", [(102, 1, "2026-01-01 17:00:00")], 3)
    _write(clicks_feed, "c4.json", [(103, 1, "2026-01-01 10:10:00")], 4)

    got = _run_stream(spark, clicks_feed, purchases_feed, tmp_path)
    pair_keys = {(p, c) for p, c, _ in got}
    # the in-time pairs arrive
    assert (201, 100) in pair_keys
    assert (202, 101) in pair_keys
    assert (203, 102) in pair_keys
    # the late click never pairs with the old purchase
    assert (200, 103) not in pair_keys
