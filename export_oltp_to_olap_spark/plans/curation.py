"""End-to-end corpus curation: the composed training-data pipeline.

One query chaining the pipeline a pretraining corpus actually runs —
language gate → quality gate → exact dedup → near-dup drop →
deterministic split — and reporting the per-split yield.  Every stage
is an operator that already exists (and is individually
oracle-checked); this registers the COMPOSITION, because the failure
mode of a pipeline is rarely one stage: it's stage coupling (a dedup
that reorders rows and breaks a downstream hash split, a filter that
changes a near-dup candidate set).

Stage order matters and is the standard one:
1. language + quality gates first — cheap per-row expressions drop
   ~30 % of rows before anything that shuffles;
2. exact dedup (hash-groupBy on text, min-doc_id keeper);
3. n-gram near-dup drop (prefix-filtered AllPairs join on survivors
   only; lower-id-wins, the LWW convention used everywhere);
4. hash-range split assignment (stable under re-partition/append) and
   the per-split yield report.

Scale: gates are zero-shuffle; dedup is one hash-groupBy; the
prefix-filter pair join is the measured-subquadratic path
(`operators/neardup.py`); split+summary is one final agg.  Nothing in
the plan is O(N²) or driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import (
    LANG_MARKERS,
    lang_predict,
    quality_score,
    sql_lang_count,
    tokens,
)
from export_oltp_to_olap_spark.operators.neardup import ngram_jaccard_pairs
from export_oltp_to_olap_spark.operators.sampling import assign_splits
from export_oltp_to_olap_spark.operators.staging import stage

QUALITY_MIN = 0.45
NEARDUP_THRESHOLD = 0.7


def curated_docs(docs: DataFrame, checkpoint: bool = True) -> DataFrame:
    """Gate + exact-dedup stages: (doc_id, text, quality) survivors.

    With ``checkpoint`` (the default) the curated set is materialized
    ONCE before any fan-out: the near-dup pair join and the yield
    report each consume it through different projections/partitionings,
    and without a stage boundary Catalyst re-derives the whole regex
    gate chain per branch (measured: 7 document scans, 18 regexp nodes
    in the executed plan).  HOW it materializes follows the
    ``spark.export_oltp.staging`` conf (operators/staging.py): ``local``
    for single-process runs, ``checkpoint``/``table`` on a cluster —
    ``table`` is exactly the "staged curated corpus as a real table"
    form a 100 TB pipeline wants.  ``checkpoint=False`` keeps the pure
    lineage for plan inspection.
    """
    gated = (
        docs.select("doc_id", "text")
        .withColumn("quality", quality_score("text"))
        .withColumn("pred_lang", lang_predict("text"))
        .where((F.col("pred_lang") == "en") & (F.col("quality") >= QUALITY_MIN))
    )
    w = Window.partitionBy("text")
    deduped = (
        gated.withColumn("min_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("min_id"))
        .drop("min_id", "pred_lang")
    )
    return stage(deduped) if checkpoint else deduped


def curated_corpus(docs: DataFrame) -> DataFrame:
    """The full curation chain's OUTPUT rows: (doc_id, text, quality,
    split) — gates, exact dedup, near-dup drop, split assignment.  The
    yield report aggregates this; the corpus EXPORT (`cli.py
    export-corpus`) ships it."""
    deduped = curated_docs(docs)
    dropped = (
        ngram_jaccard_pairs(deduped, n=3, threshold=NEARDUP_THRESHOLD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = deduped.join(dropped, "doc_id", "left_anti")
    return assign_splits(kept, "doc_id")


def corpus_curation_summary(docs: DataFrame) -> DataFrame:
    """(split, n_docs, n_tokens, sum_quality) after the full curation
    chain — the yield report of the corpus build."""
    assigned = curated_corpus(docs)
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.round(F.col("quality"), 6).cast("decimal(18,6)")), 6
            )
            .cast("double")
            .alias("sum_quality"),
        )
        .orderBy("split")
    )


def _curation_sql() -> str:
    langs = list(LANG_MARKERS)
    score_cols = ",\n         ".join(
        f"{sql_lang_count(lang)} AS score_{lang}" for lang in langs
    )
    best = f"greatest({', '.join('score_' + lang for lang in langs)})"
    pred = "CASE\n"
    pred += f"           WHEN {best} = 0 THEN 'und'\n"
    for lang in langs:
        pred += f"           WHEN score_{lang} = {best} THEN '{lang}'\n"
    pred += "           ELSE 'und' END"
    from export_oltp_to_olap_spark.operators.neardup import shingle_cte
    from export_oltp_to_olap_spark.plans.text_queries import (
        QUALITY_EXPR_SQL,
        quality_feats_cte,
    )

    return rf"""
WITH {quality_feats_cte()},
scored AS (
  SELECT doc_id, text, n_tokens,
         {QUALITY_EXPR_SQL} AS quality,
         {score_cols}
  FROM feats
),
gated AS (
  SELECT doc_id, text, n_tokens, quality
  FROM scored
  WHERE ({pred}) = 'en' AND quality >= {QUALITY_MIN}
),
deduped AS (
  SELECT doc_id, text, n_tokens, quality
  FROM (SELECT g.*, min(doc_id) OVER (PARTITION BY text) AS min_id FROM gated g)
  WHERE doc_id = min_id
),
{shingle_cte("deduped")},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {NEARDUP_THRESHOLD}
),
kept AS (
  SELECT * FROM deduped WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
),
assigned AS (
  SELECT *,
         CASE
           WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                < 52428 THEN 'train'
           WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                < 58982 THEN 'val'
           ELSE 'test'
         END AS split
  FROM kept
)
SELECT split,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(round(SUM(CAST(round(quality, 6) AS DECIMAL(18,6))), 6) AS DOUBLE)
           AS sum_quality
FROM assigned
GROUP BY split
ORDER BY split
"""


CORPUS_CURATION_SQL = _curation_sql()
