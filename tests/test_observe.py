"""Observation-API metrics: counters ride the write job itself (no
second scan) and equal the independently aggregated values."""

from __future__ import annotations

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import tokens
from export_oltp_to_olap_spark.operators.observe import (
    observed_count,
    observed_write,
)
from export_oltp_to_olap_spark.sources.parquet import load_tables


def test_observed_write_metrics_match_independent_aggregates(spark, sf001, tmp_path):
    docs = load_tables(spark, sf001, ("documents",))["documents"]
    out = str(tmp_path / "export")
    got = observed_write(
        docs,
        out,
        {
            "n_docs": F.count(F.lit(1)),
            "n_tokens": F.sum(F.size(tokens("text"))),
            # DISTINCT aggregates are rejected at the observe node
            # (map-side metric merge cannot dedup) — the mergeable
            # HLL sketch is the sanctioned cardinality counter:
            "n_sources": F.approx_count_distinct("source"),
            "n_short": F.count(F.when(F.col("n_chars") < 50, 1)),
        },
    )
    want = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
        F.approx_count_distinct("source").alias("n_sources"),
        F.count(F.when(F.col("n_chars") < 50, 1)).alias("n_short"),
    ).first()
    assert got == {k: want[k] for k in got}
    # and the write actually landed, row-complete
    assert spark.read.parquet(out).count() == got["n_docs"]


def test_observed_metrics_reject_distinct_aggregates(spark, sf001):
    """The constraint the module docstring states: DISTINCT aggregates
    fail analysis at the observe node — pinned so a Spark upgrade that
    lifts it shows up as a test failure, not a stale docstring."""
    import pytest
    from pyspark.sql.utils import AnalysisException

    docs = load_tables(spark, sf001, ("documents",))["documents"]
    with pytest.raises(AnalysisException, match="DISTINCT"):
        observed_count(docs, {"n_sources": F.count_distinct("source")})


def test_observed_count_single_pass_metrics(spark, sf001):
    docs = load_tables(spark, sf001, ("documents",))["documents"]
    got = observed_count(
        docs,
        {"n": F.count(F.lit(1)), "chars": F.sum("n_chars")},
    )
    assert got["n"] == docs.count()
    assert got["chars"] == docs.agg(F.sum("n_chars")).first()[0]


def test_observation_does_not_poison_mllib_in_callers_session(spark, sf001):
    """The module-docstring Spark bug, pinned: after an observed action,
    an MLlib model.transform(...).collect() in the CALLER's session must
    still work (the helpers isolate the observation on a child session;
    without that isolation this dies with NotSerializableException:
    ObservationManager)."""
    import export_oltp_to_olap_spark.operators.quality_model as qm

    docs = load_tables(spark, sf001, ("documents",))["documents"]
    observed_count(docs, {"n": F.count(F.lit(1))})
    rows = [(i, "good clean sentence with many plain words here " * 2) for i in range(20)] + [
        (100 + i, "!!! 111 ### 222 $$$") for i in range(20)
    ]
    feat = qm.quality_feature_frame(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    labeled = feat.withColumn("label", (F.col("doc_id") < 100).cast("double"))
    model = qm.train_quality_classifier(labeled)
    scored = qm.score_quality(model, labeled).collect()
    assert len(scored) == 40


def test_stream_metrics_per_batch_sum_to_batch_totals(spark, sf001, tmp_path):
    """Counters attached at ingest via the string-named observe form:
    per-micro-batch observedMetrics land in progress events and their
    SUM equals the batch aggregates — and the caller's session stays
    ML-safe (the named form never initializes the observation
    manager)."""
    import json as _json
    import os as _os

    from pyspark.sql import types as T

    from export_oltp_to_olap_spark.operators.observe import (
        stream_metric_totals,
        with_stream_metrics,
    )

    docs = load_tables(spark, sf001, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    feed = tmp_path / "feed_obs"
    feed.mkdir()
    for i, chunk in enumerate((rows[:100], rows[100:300], rows[300:])):
        with open(feed / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        _os.utime(feed / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    observed = with_stream_metrics(
        stream,
        "ingest",
        {
            "n_docs": F.count(F.lit(1)),
            "n_tokens": F.sum(F.size(tokens("text"))),
        },
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck_obs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    totals = stream_metric_totals([p for p in q.recentProgress], "ingest")
    want = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    ).first()
    assert totals == {"n_docs": want["n_docs"], "n_tokens": want["n_tokens"]}
