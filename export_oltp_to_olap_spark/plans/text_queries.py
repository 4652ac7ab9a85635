"""Text-analysis queries over the ``documents`` fixture table.

Wires functions/text.py into oracle-checked query shapes: language ID,
quality scoring, token stats, and content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import (
    LANG_MARKERS,
    SQL_TOKENS,
    doc_fingerprint,
    lang_predict,
    lang_scores,
    quality_features,
    quality_score,
    sql_lang_count,
    tokens,
)


def text_quality(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + blended score (corpus-filtering shape)."""
    f = quality_features("text")
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        f["n_distinct_tokens"].alias("n_distinct_tokens"),
        f["punct_ratio"].alias("punct_ratio"),
        f["space_ratio"].alias("space_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["distinct_ratio"].alias("distinct_ratio"),
        quality_score("text").alias("quality"),
    )


TEXT_QUALITY_SQL = r"""
WITH feats AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> ''))) AS BIGINT) AS n_distinct_tokens,
         CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
              AS BIGINT) AS n_punct,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digits,
         CAST(length(text) - length(regexp_replace(text, '\s', '', 'g'))
              AS BIGINT) AS n_spaces,
         CAST(len(regexp_extract_all(lower(text), '\b(the|a|and|of|is|to|in)\b'))
              AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_distinct_tokens,
       n_punct / n_chars AS punct_ratio,
       n_spaces / n_chars AS space_ratio,
       n_stop / greatest(n_tokens, 1) AS stopword_ratio,
       n_distinct_tokens / greatest(n_tokens, 1) AS distinct_ratio,
       0.4 * (n_distinct_tokens / greatest(n_tokens, 1))
       + 0.3 * (n_stop / greatest(n_tokens, 1))
       + 0.2 * (1.0 - n_punct / n_chars)
       + 0.1 * (1.0 - n_digits / n_chars) AS quality
FROM feats
"""


def text_lang_id(docs: DataFrame) -> DataFrame:
    """Marker-stopword language ID with per-language scores and argmax."""
    scores = lang_scores("text")
    cols = [scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS]
    return docs.select("doc_id", "lang", *cols, lang_predict("text").alias("pred_lang"))


def _lang_sql() -> str:
    langs = list(LANG_MARKERS)
    score_cols = ",\n       ".join(
        f"{sql_lang_count(lang)} AS score_{lang}" for lang in langs
    )
    best = f"greatest({', '.join('score_' + lang for lang in langs)})"
    # first-listed language wins ties, matching lang_predict's fold order
    pred = "CASE\n"
    pred += f"         WHEN {best} = 0 THEN 'und'\n"
    for lang in langs:
        pred += f"         WHEN score_{lang} = {best} THEN '{lang}'\n"
    pred += "         ELSE 'und' END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
       {score_cols}
  FROM documents
)
SELECT doc_id, lang, {', '.join('score_' + lang for lang in langs)},
       {pred} AS pred_lang
FROM scored
"""


TEXT_LANG_ID_SQL = _lang_sql()


def text_fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints: raw-md5 of text + order-insensitive token-set
    fingerprint (document fingerprinting primitive)."""
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_text"),
        doc_fingerprint("text").alias("tokenset_fp"),
    )


TEXT_FINGERPRINTS_SQL = """
WITH toks AS (
  SELECT doc_id, text,
         list_sort(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS t
  FROM documents
)
SELECT doc_id,
       md5(text) AS md5_text,
       md5(array_to_string(t, ' ')) AS tokenset_fp
FROM toks
"""


def token_stats_by_source(docs: DataFrame) -> DataFrame:
    """Corpus token statistics per source: docs, tokens, BPE-ish subword
    estimate (tokens ≈ words + 0.3 × long-word surplus), chars."""
    from export_oltp_to_olap_spark.functions.text import tokens

    toks = tokens("text")
    long_toks = F.size(F.filter(toks, lambda x: F.length(x) > 6)).cast("long")
    per_doc = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        long_toks.alias("n_long"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_tokens") + (F.sum("n_long") * 3) / 10).alias("est_bpe_tokens"),
        )
        .orderBy("source")
    )


TOKEN_STATS_SQL = """
WITH per_doc AS (
  SELECT source,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x <> '' AND length(x) > 6)) AS BIGINT) AS n_long,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) + (CAST(SUM(n_long) AS BIGINT) * 3) / 10 AS est_bpe_tokens
FROM per_doc
GROUP BY source
ORDER BY source
"""


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate per document.

    The subword estimate charges ceil(len(word)/4) pieces per word — the
    standard ~4-chars-per-token heuristic — as a per-row array reduction
    (no shuffle, codegen-friendly arithmetic identical in DuckDB).
    """
    toks = tokens("text")
    bpe = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / F.lit(4.0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
    )


TOKEN_COUNT_BPE_SQL = f"""
SELECT doc_id,
       CAST(len({SQL_TOKENS.format(t="text")}) AS BIGINT) AS n_ws_tokens,
       CAST(list_sum(list_transform({SQL_TOKENS.format(t="text")},
                                    t -> CAST(ceil(len(t) / 4.0) AS BIGINT)))
            AS BIGINT) AS n_bpe_tokens
FROM documents
"""
