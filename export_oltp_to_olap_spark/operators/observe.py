"""In-flight pipeline metrics via Spark's Observation API.

A 100 TB export cannot afford a second full scan just to report "how
many rows / tokens / gate-rejects did this run write?" — yet every
production pipeline must publish exactly those counters.  Spark's
``DataFrame.observe`` attaches named aggregate expressions to a plan
node; the metrics are computed BY THE SAME TASKS that execute the job
(map-side, merged on the driver) and read back after the action, so the
data-card counters cost zero extra passes.

Cite: reference `sync_oltp_to_olap.py` prints per-table row counts by
re-querying after each sync — an O(rows) second pass per table; this
module is the engine-surface replacement (counters ride the write
itself).

Constraints worth knowing (and pinned in tests/test_observe.py):

* Observation metrics are ONLY defined after an ACTION runs the plan
  containing the observe node; reading earlier raises.
* Only aggregate expressions are allowed, and DISTINCT aggregates are
  REJECTED at analysis (`INVALID_OBSERVED_METRICS.AGGREGATE_EXPRESSION_
  WITH_DISTINCT_UNSUPPORTED`) — map-side metric merging cannot dedup.
  Use `approx_count_distinct` (a mergeable sketch) for cardinalities.
* Each Observation instance is single-use per action.
* **Session-poisoning bug in this Spark build (worked around here)**:
  the session's `observationManager` is a lazily-initialized,
  NON-transient field of a serializable `SparkSession`, and
  `ObservationManager` itself is not `Serializable` — so after the
  FIRST observation initializes it, any later task closure that
  serializes the session (MLlib prediction UDFs do) dies with
  ``NotSerializableException: ObservationManager``.  Reproduced
  pure-Spark: `Observation` + `count()` then
  ``LogisticRegressionModel.transform(...).collect()`` fails; clearing
  the manager's (already empty) observations map does not help — the
  reachability is the field itself.  The helpers below therefore run
  every observed action on a THROWAWAY CHILD SESSION (`newSession()`
  shares the SparkContext and SharedState; the analyzed plan is
  rebound via `Dataset.ofRows`), leaving the caller's session's
  manager uninitialized.  Pinned in tests/test_observe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def _on_child_session(df: DataFrame) -> DataFrame:
    """Rebind ``df``'s analyzed plan onto a throwaway child session
    (same SparkContext, same SharedState/cache, fresh session state) so
    the observation initializes the CHILD's observation manager, not
    the caller's — the module-docstring bug's containment."""
    spark = df.sparkSession
    child = spark.newSession()
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        child._jsparkSession, df._jdf.queryExecution().analyzed()
    )
    return DataFrame(jdf, child)


def observed_write(
    df: DataFrame,
    out_path: str,
    metrics: dict[str, Column],
    fmt: str = "parquet",
) -> dict[str, object]:
    """Write ``df`` while computing ``metrics`` (name → aggregate
    Column) inside the SAME job, and return the metric values.

    One pass: the write is the action; the observe node rides it.  Use
    for data-card counters at export time (row counts, token sums, gate
    rejects) instead of a post-hoc re-aggregation of the written lake.
    """
    obs = Observation()
    observed = _on_child_session(df).observe(
        obs, *[c.alias(n) for n, c in metrics.items()]
    )
    observed.write.mode("overwrite").format(fmt).save(out_path)
    return dict(obs.get)


def observed_count(df: DataFrame, metrics: dict[str, Column]) -> dict[str, object]:
    """Metrics without a sink: runs ``count()`` as the action and
    returns the observed values — the cheapest way to compute several
    unrelated aggregates in one pass when no write is wanted."""
    obs = Observation()
    observed = _on_child_session(df).observe(
        obs, *[c.alias(n) for n, c in metrics.items()]
    )
    observed.count()
    return dict(obs.get)


def with_stream_metrics(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> DataFrame:
    """STREAMING form: attach named observed metrics to a streaming
    DataFrame — each micro-batch's values arrive in that batch's
    progress event (``query.recentProgress[i]["observedMetrics"]
    [name]``), so ingest gates publish per-batch counters (rows seen,
    gate rejects, tokens admitted) with zero extra passes and zero
    state.

    Uses the STRING-NAMED ``observe`` form, which never creates an
    `Observation` — and therefore never initializes the session's
    observation manager, so it is free of the module-docstring
    serialization bug (pinned in tests/test_observe.py); no child
    session needed.
    """
    return df.observe(name, *[c.alias(n) for n, c in metrics.items()])


def stream_metric_totals(progresses, name: str) -> dict[str, int]:
    """Sum a named metric set across micro-batch progress events
    (``query.recentProgress``) — the whole-run totals for SUM/COUNT
    style counters.  Accepts `StreamingQueryProgress` objects (whose
    ``observedMetrics`` values are Rows) or already-dict progress
    payloads; batches where the metric set is absent (empty
    micro-batches may skip the node) are ignored."""
    totals: dict[str, int] = {}
    for p in progresses:
        if p is None:
            continue
        om_map = p["observedMetrics"] if isinstance(p, dict) else p.observedMetrics
        om = (om_map or {}).get(name)
        if om is None:
            continue
        if not isinstance(om, dict):
            om = om.asDict()  # pyspark Row
        for k, v in om.items():
            totals[k] = totals.get(k, 0) + v
    return totals
