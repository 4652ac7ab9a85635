"""Event-stream analytics over the ``events`` fixture table.

Batch forms of the streaming-adjacent operators: sessionization (the
window-gap pattern), JSON property extraction (the fixture's ``props``
payload), and the CDC NOTIFY decode (reference worker_sync.py:88-102)
applied to a synthesized (channel, payload) feed so it's oracle-checkable
on fixture data.  The true streaming forms live in ``streaming/cdc.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.events import decode_cdc_event, json_prop
from export_oltp_to_olap_spark.plans.flagship import EXACT_SUM_SQL, exact_sum

SESSION_GAP_SEC = 1800


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Split each user's event stream into sessions at >gap_sec silences.

    Classic lag + cumulative-sum-of-breaks; the per-user window shuffles
    once on user_id and both window functions share that partitioning
    (one exchange, two window specs over it).
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    sec = F.unix_timestamp("ts")
    flagged = events.withColumn(
        "new_session",
        F.when(
            sec - F.lag(sec).over(w) > gap_sec, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            exact_sum("value").alias("total_value"),
        )
        .select("user_id", "session_id", "n_events", "session_start", "session_end", "total_value")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN CAST(epoch(ts) AS BIGINT)
                   - lag(CAST(epoch(ts) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id, ts, value,
         CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       {EXACT_SUM_SQL.format(expr="value")} AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


def events_json_stats(events: DataFrame) -> DataFrame:
    """Extract the JSON ``props.k`` int and aggregate per event_type —
    the fixture form of semi-structured payload handling."""
    k = json_prop("props", "k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            exact_sum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       {EXACT_SUM_SQL.format(expr="value")} AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def cdc_decode_events(events: DataFrame) -> DataFrame:
    """Synthesize the NOTIFY feed shape from fixture events, then decode
    with the engine's F11/F12 expressions (ref worker_sync.py:88-102):
    channel "<event_type>_sync", payload "<event_type>:<event_id>"."""
    feed = events.select(
        F.concat(F.col("event_type"), F.lit("_sync")).alias("channel"),
        F.concat(F.col("event_type"), F.lit(":"), F.col("event_id").cast("string")).alias(
            "payload"
        ),
    )
    decoded = decode_cdc_event(feed)
    return (
        decoded.groupBy("table", "op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("record_id").alias("min_id"),
            F.max("record_id").alias("max_id"),
        )
        .orderBy("table", "op")
    )


CDC_DECODE_SQL = """
WITH feed AS (
  SELECT event_type || '_sync' AS channel,
         event_type || ':' || CAST(event_id AS VARCHAR) AS payload
  FROM events
),
decoded AS (
  SELECT lower(regexp_replace(channel, '_sync$', '')) AS "table",
         lower(str_split(payload, ':')[1]) AS op,
         CAST(str_split(payload, ':')[2] AS BIGINT) AS record_id
  FROM feed
)
SELECT "table", op, count(*) AS n,
       min(record_id) AS min_id, max(record_id) AS max_id
FROM decoded
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Event-time windows (Spark window()/frame specs; SURVEY.md §2.I3 note —
# the reference has no event-time ops, these are the analytic surface)
# ---------------------------------------------------------------------------


def tumbling_hourly_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows with per-type stats.

    ``F.window`` is the same operator Structured Streaming uses with a
    watermark; batch form here so it is oracle-checkable.  One hash-agg
    shuffle on (window, event_type); the distinct user count adds the
    standard second phase.
    """
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            exact_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


TUMBLING_HOURLY_SQL = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       {EXACT_SUM_SQL.format(expr="value")} AS total_value
FROM events
GROUP BY 1, 2
"""


def hopping_halfhour_stats(events: DataFrame) -> DataFrame:
    """HOPPING (sliding) windows: 1-hour windows advancing every 30
    minutes — each event lands in window_len/slide = 2 windows.

    `F.window(ts, "1 hour", "30 minutes")` is Spark's sliding-window
    generator (internally an Expand of slide-count rows per event, then
    the same hash agg as tumbling — shuffle volume ×2, the inherent
    cost of overlap).  The DuckDB oracle restates the generator
    arithmetic directly: for offset i ∈ {0, 1}, the covering window
    start is floor((epoch − i·1800)/3600)·3600 + i·1800 — the standard
    sliding-window membership identity, cross-checked in
    tests/test_hopping_window.py against per-window interval recounts.
    """
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


HOPPING_HALFHOUR_SQL = f"""
WITH hopped AS (
  SELECT event_type, value,
         make_timestamp(
           (epoch_us(ts) - i.i * 1800000000) // 3600000000 * 3600000000
           + i.i * 1800000000
         ) AS window_start
  FROM events, (SELECT unnest([0, 1]) AS i) AS i
)
SELECT window_start, event_type,
       count(*) AS n_events,
       {EXACT_SUM_SQL.format(expr="value")} AS total_value
FROM hopped
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def user_moving_value(events: DataFrame, frame: int = 3) -> DataFrame:
    """Per-user moving sum over a ROWS frame (last ``frame``+1 events).

    Frame-spec window breadth (ROWS BETWEEN): the running sum is a
    DECIMAL accumulation so the double is engine-exact; one shuffle on
    user_id shared with the ordering.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-frame, 0)
    )
    moving = F.round(
        F.sum(F.col("value").cast("decimal(28,10)")).over(w), 2
    ).cast("double")
    return events.select(
        "user_id", "event_id", "ts", "value", moving.alias("moving_value")
    )


USER_MOVING_VALUE_SQL = """
SELECT user_id, event_id, ts, value,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS moving_value
FROM events
"""


def funnel_stages(events: DataFrame) -> DataFrame:
    """Ordered conversion funnel view → click → purchase.

    A user reaches a stage only by hitting it AFTER the previous stage
    (first view, first click at-or-after that view, first purchase
    at-or-after that click) — the sequential-conversion semantics product
    analytics needs, not independent event counts.

    Plan: one conditional-min aggregation per user (single hash-agg
    shuffle on user_id — partial aggregation collapses events map-side),
    then the stage timestamps chain through least-strict inequalities in
    plain column expressions, and a tiny unpivot + count.  No windows, no
    joins, no second pass over the raw events.
    """
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v_ts"),
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .join(per_user, "user_id")
        .where(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    stage = (
        per_user.where(F.col("v_ts").isNotNull())
        .join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select(
            F.lit(1).alias("_one"),
            F.col("v_ts").isNotNull().cast("long").alias("viewed"),
            F.col("c_ts").isNotNull().cast("long").alias("clicked"),
            F.col("p_ts").isNotNull().cast("long").alias("purchased"),
        )
    )
    agg = stage.agg(
        F.sum("viewed").alias("n_viewed"),
        F.sum("clicked").alias("n_clicked"),
        F.sum("purchased").alias("n_purchased"),
    )
    return agg.select(
        F.expr(
            "stack(3, 'view', n_viewed, 'view>click', n_clicked, "
            "'view>click>purchase', n_purchased) AS (stage, n_users)"
        )
    )


FUNNEL_STAGES_SQL = """
WITH v AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS v_ts
  FROM events GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
  GROUP BY e.user_id
),
stages AS (
  SELECT count(v.v_ts) AS n_viewed, count(c.c_ts) AS n_clicked,
         count(p.p_ts) AS n_purchased
  FROM v LEFT JOIN c ON c.user_id = v.user_id
         LEFT JOIN p ON p.user_id = v.user_id
  WHERE v.v_ts IS NOT NULL
)
SELECT 'view' AS stage, n_viewed AS n_users FROM stages
UNION ALL
SELECT 'view>click', n_clicked FROM stages
UNION ALL
SELECT 'view>click>purchase', n_purchased FROM stages
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week, counted
    as retained in each later week they were active.

    Two hash aggregations (first-seen per user; distinct users per
    (cohort_week, week_offset)) — the standard retention-matrix shape.
    Weeks, not months: the fixture stream spans ~5 weeks.  The offset is
    an exact integer day-difference / 7, so cross-engine values are
    identical.
    """
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .select(
            F.to_date("cohort_week").alias("cohort_week"),
            (F.datediff(F.to_date("active_week"), F.to_date("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


COHORT_RETENTION_SQL = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INTEGER)
         AS week_offset,
       count(*) AS n_users
FROM active a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Time-series gap filling + LOCF (hypertable-style)
# ---------------------------------------------------------------------------


def events_gapfill_locf(events: DataFrame, minutes: int = 10) -> DataFrame:
    """Dense per-series time grid with forward-filled values — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape Spark lacks as
    a builtin.

    Per event_type: bucket events to a ``minutes`` grid, then LEFT-join
    onto the series' full bucket range (``sequence`` of timestamps —
    generated from each series' min/max, so the scaffold is exactly
    span/width rows per series, never a global cross join) and
    forward-fill ``value_sum`` with the last non-null bucket
    (``last(ignorenulls)`` over an UNBOUNDED PRECEDING frame).  Leading
    buckets before a series' first value stay NULL, exactly like
    ``locf`` without a default.

    Scale: the aggregation shuffles once on (series, bucket); the
    scaffold explode is proportional to the series' time span, not the
    event volume; the fill window partitions by series — the classic
    time-series layout where each series' history is one partition's
    sort.  Skewed series (one type dominating) only skew the *agg*,
    which partial-aggregates map-side first.
    """
    bucket = F.to_timestamp(
        F.from_unixtime(F.floor(F.unix_timestamp("ts") / (minutes * 60)) * (minutes * 60))
    )
    per_bucket = (
        events.select("event_type", bucket.alias("bucket_ts"), "value")
        .groupBy("event_type", "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("value_sum"),
        )
    )
    bounds = per_bucket.groupBy("event_type").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    scaffold = bounds.select(
        "event_type",
        F.explode(
            F.expr(f"sequence(lo, hi, interval {int(minutes)} minutes)")
        ).alias("bucket_ts"),
    )
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # Linear interpolation between the surrounding non-null buckets:
    # x is epoch seconds (buckets are exact multiples of the grid, so
    # the integer epochs — and therefore the interpolation arithmetic —
    # are bit-identical across engines); ends without a neighbor stay
    # NULL, like `interpolate` without a default.
    x = F.unix_timestamp("bucket_ts")
    obs_ts = F.when(F.col("value_sum").isNotNull(), F.col("bucket_ts"))
    prev_v = F.last("value_sum", ignorenulls=True).over(w_back)
    prev_x = F.unix_timestamp(F.last(obs_ts, ignorenulls=True).over(w_back))
    next_v = F.first("value_sum", ignorenulls=True).over(w_fwd)
    next_x = F.unix_timestamp(F.first(obs_ts, ignorenulls=True).over(w_fwd))
    interp = F.when(F.col("value_sum").isNotNull(), F.col("value_sum")).otherwise(
        F.round(
            prev_v + (next_v - prev_v) * (x - prev_x) / (next_x - prev_x), 6
        )
    )
    return (
        scaffold.join(per_bucket, ["event_type", "bucket_ts"], "left")
        .select(
            "event_type",
            "bucket_ts",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "value_sum",
            prev_v.alias("filled_value"),
            interp.alias("interp_value"),
            F.col("value_sum").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "bucket_ts")
    )


GAPFILL_LOCF_SQL = f"""
WITH per_bucket AS (
  SELECT event_type,
         to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)) AS bucket_ts,
         count(*) AS n_events,
         {EXACT_SUM_SQL.format(expr="value")} AS value_sum
  FROM events
  GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM per_bucket GROUP BY 1
),
scaffold AS (
  SELECT b.event_type, CAST(g.g AS TIMESTAMP) AS bucket_ts
  FROM bounds b, unnest(generate_series(b.lo, b.hi, INTERVAL 10 MINUTE)) AS g(g)
),
joined AS (
  SELECT s.event_type,
         s.bucket_ts,
         CAST(coalesce(p.n_events, 0) AS BIGINT) AS n_events,
         p.value_sum,
         CAST(epoch(s.bucket_ts) AS BIGINT) AS x,
         CASE WHEN p.value_sum IS NOT NULL THEN s.bucket_ts END AS obs_ts
  FROM scaffold s
  LEFT JOIN per_bucket p USING (event_type, bucket_ts)
),
filled AS (
  SELECT event_type, bucket_ts, n_events, value_sum, x,
         last_value(value_sum IGNORE NULLS) OVER back AS prev_v,
         CAST(epoch(last_value(obs_ts IGNORE NULLS) OVER back) AS BIGINT) AS prev_x,
         first_value(value_sum IGNORE NULLS) OVER fwd AS next_v,
         CAST(epoch(first_value(obs_ts IGNORE NULLS) OVER fwd) AS BIGINT) AS next_x
  FROM joined
  WINDOW back AS (PARTITION BY event_type ORDER BY bucket_ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY event_type ORDER BY bucket_ts
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       bucket_ts,
       n_events,
       value_sum,
       prev_v AS filled_value,
       CASE WHEN value_sum IS NOT NULL THEN value_sum
            ELSE round(prev_v + (next_v - prev_v) * (x - prev_x) / (next_x - prev_x), 6)
       END AS interp_value,
       value_sum IS NULL AS is_gap
FROM filled
ORDER BY event_type, bucket_ts
"""


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection (deterministic variance)
# ---------------------------------------------------------------------------


def events_anomaly_zscore(
    events: DataFrame, minutes: int = 10, lookback: int = 12, min_obs: int = 6
) -> DataFrame:
    """Per-series anomaly score: each bucket's value vs the rolling
    mean/std of the previous ``lookback`` buckets (current excluded, so
    an outlier can't mask itself).

    Cross-engine determinism for VARIANCE — the classic float trap —
    follows the exact_sum recipe end-to-end: the rolling Σv and Σv² are
    accumulated in DECIMAL over the scale-2 ``value_sum`` (whose squares
    are scale-4, still exact), rounded to scale 2/4 — exactly
    representable in a double below 2^53 — and only then does double
    arithmetic (identical IEEE ops both engines) produce mean, std, z.
    Buckets with < ``min_obs`` history or zero variance score NULL.

    Scale: one (series, bucket) agg + one bounded ROWS window per
    series — same layout as the gap-fill query.
    """
    bucket = F.to_timestamp(
        F.from_unixtime(F.floor(F.unix_timestamp("ts") / (minutes * 60)) * (minutes * 60))
    )
    per_bucket = (
        events.select("event_type", bucket.alias("bucket_ts"), "value")
        .groupBy("event_type", "bucket_ts")
        .agg(exact_sum("value").alias("value_sum"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-lookback, -1)
    )
    n = F.count("value_sum").over(w)
    s = F.round(F.sum(F.col("value_sum").cast("decimal(28,10)")).over(w), 2).cast("double")
    ss = F.round(
        F.sum((F.col("value_sum") * F.col("value_sum")).cast("decimal(38,10)")).over(w), 4
    ).cast("double")
    mean = s / n
    # greatest(…, 0): catastrophic cancellation can land a zero variance
    # a hair below 0; Spark sqrt(neg) yields NaN silently, DuckDB errors
    var = F.greatest(ss / n - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when((n >= min_obs) & (std > 0), F.round((F.col("value_sum") - mean) / std, 6))
    return per_bucket.select(
        "event_type",
        "bucket_ts",
        "value_sum",
        n.cast("long").alias("n_window"),
        F.round(mean, 6).alias("roll_mean"),
        F.round(std, 6).alias("roll_std"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    ).orderBy("event_type", "bucket_ts")


ANOMALY_ZSCORE_SQL = f"""
WITH per_bucket AS (
  SELECT event_type,
         CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)) AS TIMESTAMP)
           AS bucket_ts,
         {EXACT_SUM_SQL.format(expr="value")} AS value_sum
  FROM events
  GROUP BY 1, 2
),
rolled AS (
  SELECT event_type, bucket_ts, value_sum,
         count(value_sum) OVER lb AS n_window,
         CAST(round(SUM(CAST(value_sum AS DECIMAL(28,10))) OVER lb, 2) AS DOUBLE) AS s,
         CAST(round(SUM(CAST(value_sum * value_sum AS DECIMAL(38,10))) OVER lb, 4)
              AS DOUBLE) AS ss
  FROM per_bucket
  WINDOW lb AS (PARTITION BY event_type ORDER BY bucket_ts
                ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
),
stats AS (
  SELECT event_type, bucket_ts, value_sum, n_window, s,
         sqrt(greatest(ss / n_window - (s / n_window) * (s / n_window), 0.0)) AS std
  FROM rolled
)
SELECT event_type,
       bucket_ts,
       value_sum,
       CAST(n_window AS BIGINT) AS n_window,
       round(s / n_window, 6) AS roll_mean,
       round(std, 6) AS roll_std,
       CASE WHEN n_window >= 6 AND std > 0
            THEN round((value_sum - s / n_window) / std, 6)
       END AS zscore,
       coalesce(abs(CASE WHEN n_window >= 6 AND std > 0
                         THEN round((value_sum - s / n_window) / std, 6)
                    END) > 3.0, false) AS is_anomaly
FROM stats
ORDER BY event_type, bucket_ts
"""
