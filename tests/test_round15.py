"""Round-15 optimization pins: every equivalence an r15 rewrite relies
on, stated as a test so a refactor cannot silently degrade it.

* ``standing_pairs`` retract path — pairs over a subset ≡ standing
  pairs restricted to it (per-pair-deterministic detector).
* ``corpus_prefix`` probe path — prefix rows of a union ≡ union of
  prefix rows (prefix rows are per-document).
* The explicit sets threading in the curation ledger — the curated
  upsert's physical plan must contain exactly ONE shingle build (the
  admitted-batch delta side); VERDICT r14 "what's wrong" #5 was that
  the old CacheManager plan-identity reuse could silently fall back to
  a second corpus shingle pass with no test failing.
* The lazy-staged propagation round in ``neardup_clusters`` — staged
  blocks must be complete after the convergence count (the count IS
  the materializing action now).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import neardup
from export_oltp_to_olap_spark.operators.staging import stage, stage_fanout
from export_oltp_to_olap_spark.plans import curation, leakage


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_retract_standing_pairs_equivalent(spark, sf001):
    """retract(standing_pairs) ≡ retract(in-call re-detect) — banding
    and verification are per-pair-deterministic, so the detector over
    the affected survivors equals the standing pair table restricted to
    them (the `neardup_pairs_retract` anti-join ≡ re-detect claim,
    applied to the cluster-retract re-pair)."""
    docs = _docs(spark, sf001)
    deleted = docs.select("doc_id").where(
        F.col("doc_id") % neardup.RETRACT_MOD == 0
    )
    pairs = stage_fanout(
        neardup.minhash_lsh_neardup(docs).select("doc_a", "doc_b")
    )
    labels = neardup.neardup_clusters(docs, pairs).localCheckpoint()
    in_call = _rows(neardup.neardup_clusters_retract(docs, deleted, labels))
    via_pairs = _rows(
        neardup.neardup_clusters_retract(
            docs, deleted, labels, standing_pairs=pairs
        )
    )
    assert via_pairs == in_call and in_call


def test_leakage_split_retract_standing_equivalent(spark, sf001):
    """leakage_safe_split_retract(standing labels+sets+bands) — the
    [standing] bench variant's plan — ≡ the registered bootstrap face
    (which is itself driver-hashed against the full rebuild)."""
    docs = _docs(spark, sf001)
    deleted = docs.select("doc_id").where(
        F.col("doc_id") % leakage.SPLIT_RETRACT_MOD == 0
    )
    base = _rows(leakage.leakage_safe_split_retract(docs))
    sets, bands = neardup.neardup_standing_index(docs)
    labels = stage(neardup.minhash_neardup_clusters(docs))
    standing = _rows(
        leakage.leakage_safe_split_retract(
            docs,
            deleted_ids=deleted,
            standing_labels=labels,
            standing_sets=stage(sets),
            standing_bands=stage(bands),
        )
    )
    assert standing == base and base


def test_pairs_touching_corpus_prefix_equivalent(spark, sf001):
    """pairs_touching(corpus_prefix=persisted rows) ≡ the in-call
    prefix derivation — prefix rows are per-document, so the union's
    prefix index is the union of prefix indexes."""
    docs = _docs(spark, sf001)
    cut = docs.agg(F.max("doc_id")).first()[0] * 4 // 5
    corpus_sets = stage_fanout(
        neardup.ngram_shingle_sets(docs.where(F.col("doc_id") <= cut))
    )
    delta_sets = stage_fanout(
        neardup.ngram_shingle_sets(docs.where(F.col("doc_id") > cut))
    )
    t = curation.NEARDUP_THRESHOLD
    in_call = _rows(
        neardup.ngram_jaccard_pairs_touching(corpus_sets, delta_sets, t)
    )
    prefix = stage(neardup._prefix_index(corpus_sets, t))
    via_prefix = _rows(
        neardup.ngram_jaccard_pairs_touching(
            corpus_sets, delta_sets, t, corpus_prefix=prefix
        )
    )
    assert via_prefix == in_call and in_call


def test_ngram_jaccard_pairs_explicit_sets_equivalent(spark, sf001):
    """ngram_jaccard_pairs(sets=staged table) ≡ the docs form — the
    explicit threading the r15 ledger uses instead of CacheManager
    plan-identity."""
    docs = _docs(spark, sf001)
    want = _rows(neardup.ngram_jaccard_pairs(docs, n=3, threshold=0.7))
    sets = stage_fanout(neardup.ngram_shingle_sets(docs, n=3))
    got = _rows(neardup.ngram_jaccard_pairs(sets=sets, n=3, threshold=0.7))
    assert got == want and want


def _count_zipwith_outside_caches(jnode) -> int:
    """Expressions containing the zip_with shingle construction in the
    EXECUTED plan, skipping InMemoryTableScan subtrees (a cached
    relation's embedded plan is not re-executed) and descending through
    the AQE / query-stage wrappers."""
    cls = jnode.getClass().getSimpleName()
    if cls == "InMemoryTableScanExec":
        return 0
    if cls == "AdaptiveSparkPlanExec":
        return _count_zipwith_outside_caches(jnode.executedPlan())
    if cls.endswith("QueryStageExec"):
        return _count_zipwith_outside_caches(jnode.plan())
    n = 0
    exprs = jnode.expressions()
    for i in range(exprs.size()):
        if "zip_with" in exprs.apply(i).toString():
            n += 1
    ch = jnode.children()
    for i in range(ch.size()):
        n += _count_zipwith_outside_caches(ch.apply(i))
    return n


def test_curated_upsert_plan_has_single_shingle_build(spark, sf001):
    """The curated_upsert fixture's executed plan must shingle exactly
    ONE side: the admitted batch (the probe's delta side).  The corpus
    side must arrive as re-keyed rows of the ledger's staged set table
    (an in-memory scan), never a second tokenizer/shingle pass.  Guard
    for VERDICT r14 "what's wrong" #5: before the r15 explicit sets
    threading, a CacheManager plan-identity miss silently re-shingled
    the whole post-retract stage with no test failing.

    Measured shape: the delta-side build appears as 6 zip_with
    expression sites outside caches (the prefix a/b sides and the
    Filter/Project duplication around them).  A corpus-side build
    leaking back in adds sites over the (~6x larger) stage frame — any
    increase here must be consciously reviewed, so the bound is pinned
    exactly."""
    df = curation.curated_upsert_fixture(_docs(spark, sf001))
    df.collect()  # AQE: the final plan only exists after execution
    n_builds = _count_zipwith_outside_caches(
        df._jdf.queryExecution().executedPlan()
    )
    assert 1 <= n_builds <= 6, (
        f"curated_upsert executed plan contains {n_builds} zip_with "
        "shingle sites outside caches (expected the delta-side build "
        "only, <= 6 sites) - a corpus-side shingle build may have "
        "leaked back in"
    )


def test_curated_upsert_consumes_threaded_sets(spark, sf001):
    """The probe must actually READ the threaded ``standing_sets``
    rows (not silently fall back to re-shingling the stage): feeding a
    sets table with every shingle array emptied must change the
    output — corpus-side matches disappear from the probe, so strictly
    more rows survive the near-dup drop.  Uses the registered fixture's
    planted CDC batch (the is_near class guarantees delta↔corpus ≥0.7
    pairs at sf0.01, pinned by the fixture-branch fire-count test)."""
    from export_oltp_to_olap_spark.operators.neardup import (
        UPSERT_CHG_MOD,
        UPSERT_DEL_MOD,
        UPSERT_SUFFIX,
    )

    base = _docs(spark, sf001)
    deleted = base.select("doc_id").where(F.col("doc_id") % UPSERT_DEL_MOD == 0)
    nbr = base.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("nbr_text")
    )
    is_twin = F.col("doc_id") % curation.UPSERT_COPY_MOD == 1
    is_near = F.col("doc_id") % curation.UPSERT_COPY_MOD == 15
    is_chg = F.col("doc_id") % UPSERT_CHG_MOD == 0
    changed = (
        base.where(F.col("doc_id") % UPSERT_DEL_MOD != 0)
        .where(is_twin | is_near | is_chg)
        .join(nbr, "doc_id", "left")
        .select(
            "doc_id",
            F.when(is_twin, F.coalesce("nbr_text", F.col("text")))
            .when(
                is_near,
                F.concat(
                    F.coalesce("nbr_text", F.col("text")), F.lit(UPSERT_SUFFIX)
                ),
            )
            .otherwise(F.concat(F.col("text"), F.lit(UPSERT_SUFFIX)))
            .alias("text"),
        )
    )
    keepers, losers, pairs, sets = curation.curation_standing_ledger(
        base, return_sets=True
    )
    real = curation.curated_upsert(
        deleted, changed, keepers, losers, pairs, standing_sets=sets
    ).count()
    poisoned_sets = sets.select(
        "doc_id",
        F.array().cast("array<string>").alias("shs"),
        F.lit(0).alias("n_sh"),
    )
    poisoned = curation.curated_upsert(
        deleted, changed, keepers, losers, pairs, standing_sets=poisoned_sets
    ).count()
    # both runs share the retract/challenge legs; only the probe's
    # corpus side consumes the sets, and emptying every corpus shingle
    # array removes delta<->corpus pairs, so fewer docs drop.
    assert poisoned > real > 0


def test_lazy_stage_blocks_complete_after_count(spark):
    """stage(eager=False) + a full filter-count must leave the staged
    frame complete and lineage-free reusable (the neardup_clusters
    convergence pattern)."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("label")
    )
    staged = stage(df, eager=False)
    n = staged.where(F.col("label") < 3).count()
    assert n == sum(1 for i in range(1000) if i % 7 < 3)
    # full contents still intact after the partial-filter action
    assert staged.count() == 1000
    assert _rows(staged.select("doc_id", "label")) == {
        (i, i % 7) for i in range(1000)
    }
