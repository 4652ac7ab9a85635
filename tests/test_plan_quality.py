"""Physical-plan quality gates — the properties that matter at 100 TB.

Correctness tests prove the answers are right; these prove the PLANS are
right: filters reach the parquet scan, scans read only needed columns,
fixture-scale joins broadcast instead of shuffling both sides, and the
hot paths stay inside whole-stage codegen.  A regression here silently
multiplies cost at scale long before it shows in a 600k-row benchmark.
"""

from __future__ import annotations

import re

import pytest

from export_oltp_to_olap_spark import registry

registry._ensure_loaded()


def _plan(spark, sf_dir, name: str) -> str:
    df = registry.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _nodes_outside_cache_builds(df) -> list[tuple[str, str]]:
    """Walk the executed physical plan via the JVM tree and return
    ``(class, simpleString)`` per node, STOPPING at the cache boundary.

    A cached stage legitimately CONTAINS the expensive build plan (gates,
    scans) — it runs once, at materialization.  What a fan-out plan test
    must assert is that those nodes appear ONLY there, never in the query
    body above the cache.  Every STRING rendering of the plan is the
    wrong surface for that: both ``executedPlan().toString()`` and
    formatted explain print the ``InMemoryRelation``'s build plan as
    innerChildren, whose nested AQE sections RESET indentation (so the
    subtree cannot be excised by depth), and what prints depends on
    session cache state — a prior test materializing the same frame
    flips the string, which made this assertion order-dependent in the
    suite.  The real tree has no such ambiguity: ``InMemoryTableScanExec``
    is a leaf (the build plan hangs off its relation, not its children),
    so a walk that descends through AQE and query-stage wrappers and
    stops at cache scans sees exactly the query body."""
    out: list[tuple[str, str]] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        out.append((cls, node.simpleString(10000)))
        if cls == "InMemoryTableScanExec":
            return
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_point_filter_pushed_to_parquet_scan(spark, sf001):
    plan = _plan(spark, sf001, "point_filter_customer")
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(c_custkey,42\)", plan), plan


def test_date_range_filter_pushed_to_scan(spark, sf001):
    plan = _plan(spark, sf001, "date_range_orders")
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan", plan) or re.search(
        r"PushedFilters: \[[^\]]*GreaterThanOrEqual", plan
    ), plan


def test_column_pruning_reaches_scan(spark, sf001):
    """exact dedup touches only (doc_id, text); the documents scan must
    not read any other column."""
    plan = _plan(spark, sf001, "exact_dedup_documents")
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans, plan
    for cols in scans:
        names = {c.split("#")[0] for c in cols.split(",") if c}
        assert names <= {"doc_id", "text"}, names


def test_fixture_scale_joins_broadcast(spark, sf001):
    """The flagship 5-table join and the star fact build must broadcast
    every dimension side — zero sort-merge joins at fixture scale."""
    for name in ("flagship_revenue", "star_fact_source", "star_hecho_ventas"):
        plan = _plan(spark, sf001, name)
        assert "SortMergeJoin" not in plan, f"{name} fell back to SMJ"
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast joins"


def test_hot_paths_in_wholestage_codegen(spark, sf001):
    """Codegen spans (the `*(N)` node prefixes) only appear in the AQE
    final plan, and only the DataFrame's OWN execution finalizes it —
    `.count()` would plan a different query, so collect() first."""
    for name in ("pricing_summary", "flagship_revenue", "star_hecho_ventas"):
        df = registry.REGISTRY[name].fn(spark, sf001)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, f"{name}: AQE never finalized"
        assert "*(" in plan, f"{name} runs interpreted (no codegen spans)"


@pytest.mark.slow
def test_no_cartesian_products_anywhere(spark, sf001):
    """Only the brute-force ANN baseline is allowed a cross join (it is
    one by definition, with the small side broadcast)."""
    allowed = {"ann_cosine_topk", "embedding_cosine_neardup", "label_knn_noise"}
    for name, reg in sorted(registry.REGISTRY.items()):
        if name in allowed:
            continue
        plan = _plan(spark, sf001, name)
        assert "CartesianProduct" not in plan, f"{name} has a cartesian product"


def test_text_repetition_has_no_shuffle(spark, sf001):
    """The repetition metrics are per-row HOF arithmetic — a shuffle
    appearing here means someone rewrote them as explode+groupBy."""
    df = registry.REGISTRY["text_repetition"].fn(spark, sf001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_tfidf_broadcasts_small_sides(spark, sf001):
    """tf-idf joins the per-term df table and the scalar source count
    into the tf table — both tiny, both must broadcast (no SMJ)."""
    df = registry.REGISTRY["tfidf_top_terms"].fn(spark, sf001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "Broadcast" in plan, plan


def test_funnel_and_cohort_stay_broadcast_at_fixture_scale(spark, sf001):
    for name in ("events_funnel", "events_cohort_retention"):
        df = registry.REGISTRY[name].fn(spark, sf001)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize("name", ["purchases_asof_clicks", "clicks_before_purchase"])
def test_time_join_operators_have_no_quadratic_stage(spark, sf001, name):
    """As-of and interval joins must never appear as nested-loop/cartesian
    plans — that is exactly the blowup they exist to avoid."""
    plan = _plan(spark, sf001, name)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_semantic_dedup_plan_shape(spark, sf001):
    """SemDeDup's scale contract in the physical plan: centroid
    assignment is a broadcast nested loop over C rows (never a shuffled
    cross product) — inspected on the assignment stage itself, since
    the registered query stages it behind a localCheckpoint — and the
    post-checkpoint pair join carries no cartesian."""
    from export_oltp_to_olap_spark.operators.similarity import (
        centroid_table,
        rank_centroids,
        with_norm,
    )
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    emb = load_tables(spark, sf001, ("embeddings",))["embeddings"]
    base = with_norm(emb).select("vec_id", "embedding", "norm")
    assign = rank_centroids(base, centroid_table(base, 16)).where("cen_rank = 1")
    assign.collect()
    assign_plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in assign_plan, assign_plan
    assert (
        "BroadcastNestedLoopJoin" in assign_plan
        or "BroadcastHashJoin" in assign_plan
    ), assign_plan

    plan = _plan(spark, sf001, "semantic_dedup")
    assert "CartesianProduct" not in plan, plan


def test_curation_gates_prune_document_columns(spark, sf001):
    """The curation gate/dedup stages touch only (doc_id, text); scans
    must never read lang/source metadata columns.  Inspected with
    checkpoint=False — the registered query materializes this stage
    behind a localCheckpoint, which (by design) leaves no scans in the
    final plan."""
    from export_oltp_to_olap_spark.plans.curation import curated_docs
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    docs = load_tables(spark, sf001, ("documents",))["documents"]
    df = curated_docs(docs, checkpoint=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans, plan
    for cols in scans:
        names = {c.split("#")[0] for c in cols.split(",") if c}
        assert names <= {"doc_id", "text"}, names


def test_curation_checkpoint_collapses_gate_recompute(spark, sf001):
    """The registered curation query must NOT re-derive the gate chain
    per fan-out branch: with the staged curated set, the executed plan
    contains zero regex gate nodes and zero document rescans."""
    df = registry.REGISTRY["corpus_curation_summary"].fn(spark, sf001)
    df.collect()
    nodes = _nodes_outside_cache_builds(df)
    # the staged set IS cache-served
    assert any(cls == "InMemoryTableScanExec" for cls, _ in nodes), nodes
    gate_hits = [s for _, s in nodes if "regexp_replace" in s]
    assert not gate_hits, gate_hits
    rescans = [
        (cls, s)
        for cls, s in nodes
        if "FileSourceScan" in cls or "Scan parquet" in s
    ]
    assert not rescans, rescans


def test_quality_scores_saved_is_one_mapside_sweep(spark, sf001):
    """The committed-artifact scorer reads ONLY (doc_id, text) from the
    documents scan, inlines the whole sigmoid margin as one Project
    over the scan (no ML runtime, no Python), and shuffles exactly once
    — the final orderBy's range partitioning.  That is the plan shape
    that makes the 100 TB scoring pass a single map-side sweep."""
    plan = _plan(spark, sf001, "quality_scores_saved")
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans, plan
    for cols in scans:
        names = {c.split("#")[0] for c in cols.split(",") if c}
        assert names <= {"doc_id", "text"}, names
    assert plan.count("Exchange") == 1 and "rangepartitioning" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_c4_and_gopher_gates_are_map_only(spark, sf001):
    """Both rule-set filters claim zero-shuffle map scans — the shape
    that lets them run unchanged at streaming ingest.  The only
    permitted exchange is the presentation sort's range partitioning
    (absent in the ordered=False streaming form)."""
    from export_oltp_to_olap_spark.plans.text_queries import (
        c4_quality_flags,
        gopher_quality_flags,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    for fn in (c4_quality_flags, gopher_quality_flags):
        df = fn(docs, ordered=False)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (fn.__name__, plan)


def test_boilerplate_joins_totals_by_broadcast(spark, sf001):
    """The per-source totals side is one row per source — it must
    broadcast; an SMJ here means the corpus-scale gram counts are
    being sorted against a 20-row frame."""
    for name in ("boilerplate_ngrams", "boilerplate_ngrams_delta"):
        df = registry.REGISTRY[name].fn(spark, sf001)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, (name, plan)
        assert "BroadcastHashJoin" in plan, (name, plan)


def test_curriculum_manifest_has_no_join_no_smj(spark, sf001):
    """Shard + band are map-side arithmetic; the only shuffles are the
    (shard, band) aggregation and the presentation sort."""
    df = registry.REGISTRY["curriculum_manifest"].fn(spark, sf001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "Join" not in plan, plan


def test_round11_spectra_are_two_agg_plans(spark, sf001):
    """The two spectrum faces claim pure agg pipelines: no join of any
    kind, and for doc_length_spectrum no explode either (bucketing is
    per-row arithmetic before ONE groupBy)."""
    for name in ("token_zipf_spectrum", "doc_length_spectrum"):
        df = registry.REGISTRY[name].fn(spark, sf001)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, (name, plan)
    df = registry.REGISTRY["doc_length_spectrum"].fn(spark, sf001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan  # no explode: size() is per-row


def test_vocab_overlap_pair_join_broadcasts(spark, sf001):
    """The pair join's probe side is S·k rows (bounded by the source
    catalog) — it must broadcast; an SMJ would sort the top-k frame
    twice for nothing."""
    df = registry.REGISTRY["source_vocab_overlap"].fn(spark, sf001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_schema_drift_audit_is_one_agg_pass(spark, sf001):
    """The drift report's heavy work is ONE aggregate over the merged
    read (count + per-column non-null counts together); the published
    frame is local arithmetic on that single row."""
    from pyspark.sql import functions as F

    from export_oltp_to_olap_spark.sources import evolution

    df = evolution.read_evolved_parquet(
        spark, f"{sf001}/orders.parquet", f"{sf001}/customer.parquet"
    )
    agg = df.agg(*[F.count(c) for c in df.columns])
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan, plan


def test_capped_allocation_boundary_broadcasts(spark, sf001):
    """The chosen waterfilling boundary is ONE row joined onto S source
    rows — it must arrive as a broadcast nested loop (the allowlisted
    degenerate cross join), never an SMJ, and the plan carries no
    corpus-scale join at all (mixture_weights' aggregate is the only
    data-scale stage)."""
    df = registry.REGISTRY["capped_epoch_allocation"].fn(spark, sf001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
