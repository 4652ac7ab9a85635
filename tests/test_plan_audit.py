"""Plan-introspection API: the counters must reflect the plan-quality
properties test_plan_quality.py pins, and the sweep must flag the
anti-patterns it exists to catch."""

from __future__ import annotations

import pytest
import json

from pyspark.sql import functions as F

from export_oltp_to_olap_spark import plan_audit, registry

registry._ensure_loaded()


def test_summary_counters_match_known_plan_shapes(spark, sf0001):
    # flagship: broadcast-joined star agg — broadcasts, no cartesian/SMJ
    df = registry.REGISTRY["flagship_revenue"].fn(spark, sf0001)
    s = plan_audit.plan_summary(df, execute=True)
    assert s["broadcast_joins"] >= 1
    assert s["sortmerge_joins"] == 0
    assert s["cartesian_products"] == 0
    assert s["codegen_spans"] >= 1
    assert s["final"] is True
    assert s["scans"] and all(sc["columns"] > 0 for sc in s["scans"])

    # point filter: the pushed-filter bit must reach the scan summary
    pf = plan_audit.plan_summary(
        registry.REGISTRY["point_filter_customer"].fn(spark, sf0001)
    )
    assert any(sc["pushed_filters"] for sc in pf["scans"])


def test_summary_detects_cartesian_product(spark):
    # A small cross join plans as BroadcastNestedLoopJoin; the shuffle-level
    # quadratic marker only appears when neither side can broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10).select(F.col("id").alias("x"))
        b = spark.range(10).select(F.col("id").alias("y"))
        s = plan_audit.plan_summary(a.crossJoin(b))
        assert s["cartesian_products"] >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_audit_plans_subset_is_clean(spark, sf0001):
    rows = plan_audit.audit_plans(
        spark, sf0001, names=["pricing_summary", "exact_dedup_documents"]
    )
    assert [r["query"] for r in rows] == ["pricing_summary", "exact_dedup_documents"]
    assert all(r["flags"] == [] for r in rows)


def test_cli_explain_emits_summary_json(spark, sf0001, capsys):
    from export_oltp_to_olap_spark.cli import main

    rc = main(["explain", "pricing_summary", "--sf-dir", sf0001], spark=spark)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == "pricing_summary"
    assert "shuffle_exchanges" in out and "flags" not in out

    assert main(["explain", "no_such_query"], spark=spark) == 2


@pytest.mark.slow
def test_full_registry_sweep_matches_audited_baseline(spark, sf0001):
    """The shipped registry must sweep clean: every cartesian is in
    CARTESIAN_ALLOWED and every SortMergeJoin is full-outer or in
    SMJ_EXPECTED.  A new flag here means an operator grew an
    un-reviewed both-sides-shuffle or a dropped join key."""
    rows = plan_audit.audit_plans(spark, sf0001)
    flagged = {r["query"]: r["flags"] for r in rows if r["flags"]}
    assert flagged == {}, flagged
