"""Exact duplicated-span detection: the substring rung of the dedup ladder.

Whole-document dedup (exact / normalized / MinHash / SemDeDup — see
`operators/neardup.py`, `operators/semdedup.py`) misses the dominant
duplication mode in web corpora: long verbatim passages (boilerplate,
licenses, quoted articles) embedded inside otherwise-distinct documents.
The published fix (Lee et al., "Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499) removes every substring of
≥ 50 tokens that occurs more than once in the corpus, built on a suffix
array.  A suffix array is inherently sequential; the distributed
equivalent used at corpus scale is hashed positional n-grams:

1. Emit ``(doc_id, pos, hash(gram))`` for EVERY token position — unlike
   the near-dup shinglers this keeps positions, not a distinct set.
2. A gram occurring at ≥ 2 positions corpus-wide (any doc, including
   the same one — intra-doc boilerplate repeats count too) is a
   duplicated-span seed.  One partial-aggregated count per gram hash.
3. Join seeds back to positions and merge per-doc runs of seed
   positions into MAXIMAL spans with the gaps-and-islands pattern
   (lag + running sum — the `events_sessionize` shape): positions
   ``p, q`` merge when ``q - p ≤ n`` (their n-token windows overlap or
   touch), so a duplicated passage of any length reports as ONE span
   ``[start_tok, end_tok]``, exactly what a span-removal rewrite needs.

Any span this finds is a verbatim duplicate ≥ n tokens (modulo hash
collision, negligible at 64 bits); a duplicated passage of length
≥ 2n−1 is always found.  Passages in [n, 2n−2] may be missed when no
single n-gram window falls inside them — the standard positional
n-gram / suffix-array trade, tuned by n.

Scale (100 TB): step 1 is map-side fan-out (one long per token
position — ~8 bytes/token, comparable to the tokenized corpus itself).
Step 2 shuffles gram hashes once with map-side partial counts.  Step 3
is a large-large sort-merge join on the 8-byte hash followed by one
per-doc window — three shuffles total, all on well-distributed hash /
id keys, nothing quadratic, no driver state.  Skew: a stop-phrase gram
("of the and of…") can hold millions of positions, but the join output
stays one row per (position, seed-hit) and the per-gram count is
partial-aggregated, so hot grams cost bandwidth, not memory; an
optional document-frequency cap like `ngram_jaccard_pairs`' would trim
them at a recall cost (not wired — span seeds ARE often stop-phrases in
real boilerplate).

Reference parity: none — the reference engine (sync_oltp_to_olap.py)
has no corpus operators; north-star extension per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import TOKEN_SPLIT_RE, tokens
from export_oltp_to_olap_spark.operators.partitioning import spread_for_compute
from export_oltp_to_olap_spark.operators.staging import stage_fanout

# Published pipelines use 50-token spans; the synthetic fixture docs are
# ~tens of tokens, so the fixture width is 8 — long enough that seeds
# are real clone/boilerplate overlap (not chance phrase collisions, as
# verified by the planted-passage unit tests), short enough to fire.
FIXTURE_SPAN_N = 8


def positional_grams(
    docs: DataFrame, n: int = FIXTURE_SPAN_N, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, pos, g)`` — one row per token position, ``g`` the
    xxhash64 of the n-token window starting there (1-based ``pos``).

    The hash is built INSIDE the exploded struct so Catalyst cannot
    collapse a second full tokenize+shingle evaluation above the
    Generate (the CollapseProject trap documented at
    `operators/decontam.py:79`)."""
    toks = tokens(text_col)
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))).alias("g"),
        ),
    )
    guarded = F.when(F.size(toks) >= n, windows).otherwise(
        F.array().cast("array<struct<pos:int,g:bigint>>")
    )
    return (
        spread_for_compute(docs.select(id_col, text_col), id_col)
        .select(F.col(id_col), F.explode(guarded).alias("w"))
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.g").alias("g"))
    )


def duplicated_spans(
    docs: DataFrame, n: int = FIXTURE_SPAN_N, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Maximal duplicated spans per document.

    Returns ``(doc_id, span_start, span_end, span_tokens)`` — 1-based
    inclusive token bounds of every maximal run of positions whose
    n-gram occurs ≥ 2 times corpus-wide; ordered for the driver hash.
    """
    # Stage the positional grams once: both the seed count and the
    # join-back consume them, and recomputing the tokenize+shingle+hash
    # fan-out doubles the most expensive map stage (warm runs 2.0 s at
    # sf0.1; at 100 TB the staged gram table is the thing to persist).
    pg = stage_fanout(positional_grams(docs, n, id_col, text_col))
    seeds = pg.groupBy("g").agg(F.count(F.lit(1)).alias("occ")).where(F.col("occ") >= 2)
    dup_pos = pg.join(seeds.select("g"), "g", "inner").select(id_col, "pos")

    by_doc = Window.partitionBy(id_col).orderBy("pos")
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("pos").over(by_doc)
    islands = dup_pos.withColumn(
        "isl",
        F.sum(F.when(prev.isNotNull() & (F.col("pos") - prev <= n), 0).otherwise(1)).over(run),
    )
    return (
        islands.groupBy(id_col, "isl")
        .agg(F.min("pos").alias("mn"), F.max("pos").alias("mx"))
        .select(
            F.col(id_col),
            F.col("mn").cast("long").alias("span_start"),
            (F.col("mx") + F.lit(n - 1)).cast("long").alias("span_end"),
            (F.col("mx") - F.col("mn") + F.lit(n)).cast("long").alias("span_tokens"),
        )
        .orderBy(id_col, "span_start")
    )


def span_dedup_report(
    docs: DataFrame, n: int = FIXTURE_SPAN_N, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-coverage summary over `duplicated_spans`:
    ``(doc_id, n_tokens, n_spans, dup_tokens, dup_ratio)`` for every doc
    with at least one duplicated span.  ``dup_ratio`` (duplicated-token
    fraction, 6 decimals) is the drop/rewrite decision input — published
    pipelines cut spans out rather than dropping whole docs, but the
    ratio also serves a cheap doc-level gate."""
    spans = duplicated_spans(docs, n, id_col, text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
    )
    sizes = spread_for_compute(docs.select(id_col, text_col), id_col).select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("n_tokens")
    )
    return (
        per_doc.join(sizes, id_col)
        .select(
            id_col,
            "n_tokens",
            "n_spans",
            "dup_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_ratio"),
        )
        .orderBy(id_col)
    )


def strip_duplicated_spans(
    docs: DataFrame, n: int = FIXTURE_SPAN_N, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The REWRITE face of span dedup (Lee et al. arXiv:2107.06499 §4:
    published pipelines cut the duplicated substring out of the text,
    they don't drop the document): emit every document's cleaned,
    normalized token stream with non-canonical duplicated windows
    removed.

    Canonicality is per gram at document granularity: the gram's
    canonical document is the corpus-wide MIN doc_id containing it, and
    a token position is removed when it is covered by a duplicated
    gram's window in a NON-canonical document.  One copy of every
    duplicated passage therefore survives (in its lowest-id carrier);
    intra-document repeats inside the canonical carrier also survive —
    the documented trade for keeping canonicality a one-agg decision
    instead of a per-occurrence global argmin.

    Output: ``(doc_id, n_tokens, removed_tokens, kept_tokens,
    clean_text)`` for EVERY document (untouched docs pass through with
    ``removed_tokens = 0``); ``clean_text`` is the kept tokens joined
    with single spaces — the rewrite operates on the normalized token
    stream, exactly the stream the span detector hashed.

    Scale: canonical assignment is the same one-shuffle gram aggregate
    as `duplicated_spans`; removal fan-out is one row per REMOVED token
    (linear in the duplicated text, never in the corpus); the rebuild
    is one per-doc sort inside a groupBy — all keys well-distributed,
    nothing quadratic, no driver state.
    """
    pg = stage_fanout(positional_grams(docs, n, id_col, text_col))
    # gram → (occurrence count, canonical doc); seeds are the ≥2 grams
    canon = (
        pg.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"), F.min(id_col).alias("canon_doc"))
        .where(F.col("occ") >= 2)
        .select("g", "canon_doc")
    )
    # non-canonical duplicated windows, merged into maximal removal
    # intervals per doc (same gaps-and-islands as `duplicated_spans`)
    windows = (
        pg.join(canon, "g")
        .where(F.col(id_col) != F.col("canon_doc"))
        .select(id_col, "pos")
        .distinct()
    )
    return strip_window_positions(docs, windows, n, id_col, text_col)


def strip_window_positions(
    docs: DataFrame,
    windows: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Shared rewrite tail: given ``(id, pos)`` n-token removal-window
    STARTS, island-merge them, cut the covered tokens, and rebuild every
    document's normalized token stream — the machinery behind both
    `strip_duplicated_spans` and decontamination's
    `strip_contaminated_spans` (only the window SOURCE differs).

    Scale: one per-doc window over the (sparse) window starts, one row
    per REMOVED token (linear in removed text), one per-doc rebuild
    aggregation — nothing proportional to corpus × windows."""
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev = F.lag("pos").over(Window.partitionBy(id_col).orderBy("pos"))
    spans = (
        windows.withColumn(
            "isl",
            F.sum(
                F.when(prev.isNotNull() & (F.col("pos") - prev <= n), 0).otherwise(1)
            ).over(run),
        )
        .groupBy(id_col, "isl")
        .agg(F.min("pos").alias("mn"), (F.max("pos") + F.lit(n - 1)).alias("mx"))
    )
    # one row per REMOVED token position — linear in removed text
    removed_pos = spans.select(
        F.col(id_col), F.explode(F.sequence("mn", "mx")).alias("pos")
    )
    toks = tokens(text_col)
    tok_pos = (
        spread_for_compute(docs.select(id_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.posexplode_outer(toks).alias("p0", "tok"),
        )
        .select(id_col, (F.col("p0") + 1).alias("pos"), "tok")
    )
    kept = tok_pos.join(removed_pos, [id_col, "pos"], "left_anti")
    rebuilt = kept.where(F.col("tok").isNotNull()).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("kept_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    sizes = spread_for_compute(docs.select(id_col, text_col), id_col).select(
        F.col(id_col), F.size(toks).cast("long").alias("n_tokens")
    )
    return (
        sizes.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("kept_tokens"), F.lit(0)))
            .cast("long")
            .alias("removed_tokens"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
        .orderBy(id_col)
    )


def _pos_grams_sql(n: int) -> str:
    """Shared DuckDB CTE prefix: tokens → positional md5 grams.

    DuckDB hashes with md5 (its xxhash64 is unavailable); the engines
    only compare SPAN outputs, never hash values, so any collision-free
    hash gives identical results."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM documents
),
pos_grams AS (
  SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+{n - 1}], ' ')) AS g
  FROM toks, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS u(i)
),
seeds AS (
  SELECT g FROM pos_grams GROUP BY g HAVING count(*) >= 2
),
dup_pos AS (
  SELECT doc_id, pos FROM pos_grams JOIN seeds USING (g)
),
islands AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NOT NULL AND pos - prev <= {n} THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
  FROM (
    SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM dup_pos
  )
),
spans AS (
  SELECT doc_id,
         CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + {n - 1} AS BIGINT) AS span_end,
         CAST(max(pos) - min(pos) + {n} AS BIGINT) AS span_tokens
  FROM islands GROUP BY doc_id, isl
)"""


def dup_spans_sql(n: int = FIXTURE_SPAN_N) -> str:
    """DuckDB restatement of `duplicated_spans` at the same ``n``."""
    return _pos_grams_sql(n) + """
SELECT doc_id, span_start, span_end, span_tokens
FROM spans ORDER BY doc_id, span_start
"""


def span_report_sql(n: int = FIXTURE_SPAN_N) -> str:
    """DuckDB restatement of `span_dedup_report` at the same ``n``."""
    return _pos_grams_sql(n) + """
SELECT s.doc_id,
       CAST(len(k.t) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(span_tokens) AS BIGINT) AS dup_tokens,
       round(sum(span_tokens) / CAST(len(k.t) AS BIGINT), 6) AS dup_ratio
FROM spans s JOIN toks k USING (doc_id)
GROUP BY s.doc_id, len(k.t)
ORDER BY s.doc_id
"""


def strip_tail_ctes(n: int, toks_cte: str = "toks") -> str:
    """The shared rewrite CTE chain (islands → spans → removal →
    ``rebuilt``), WITHOUT a final select — composable faces (e.g. the
    curation-with-rewrite chain) append their own select joining extra
    columns.  Expects two prior CTEs: ``toks_cte`` with ``(doc_id, t)``
    token arrays for the docs being rewritten, and ``win(doc_id, pos)``
    with the removal-window starts; mirrors
    :func:`strip_window_positions` exactly."""
    return f"""
islands AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NOT NULL AND pos - prev <= {n} THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
  FROM (
    SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM win
  )
),
spans AS (
  SELECT doc_id, min(pos) AS mn, max(pos) + {n - 1} AS mx
  FROM islands GROUP BY doc_id, isl
),
removed AS (
  SELECT DISTINCT doc_id, i AS pos
  FROM spans, unnest(generate_series(mn, mx)) AS u(i)
),
tok_pos AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM {toks_cte}, unnest(generate_series(1, len(t))) AS u(i)
),
strip_kept AS (
  -- named strip_kept, not kept: composing faces (the curation chain)
  -- already define a `kept` CTE of their own
  SELECT tp.doc_id, tp.pos, tp.tok
  FROM tok_pos tp
  ANTI JOIN removed r ON r.doc_id = tp.doc_id AND r.pos = tp.pos
),
rebuilt AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM strip_kept GROUP BY doc_id
)""".strip()


def strip_tail_sql(n: int, toks_cte: str = "toks") -> str:
    """`strip_tail_ctes` plus the standalone faces' final select."""
    return f"""
{strip_tail_ctes(n, toks_cte)}
SELECT k.doc_id,
       CAST(len(k.t) AS BIGINT) AS n_tokens,
       CAST(len(k.t) - COALESCE(r.kept_tokens, 0) AS BIGINT) AS removed_tokens,
       CAST(COALESCE(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       COALESCE(r.clean_text, '') AS clean_text
FROM {toks_cte} k LEFT JOIN rebuilt r USING (doc_id)
ORDER BY k.doc_id
""".strip()


def strip_spans_sql(n: int = FIXTURE_SPAN_N) -> str:
    """DuckDB restatement of `strip_duplicated_spans` at the same ``n``.

    Hash choice (md5 here, xxhash64 in the engine) is invisible:
    canonicality and spans depend only on gram EQUALITY, and only the
    rebuilt token streams are compared."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM documents
),
pos_grams AS (
  SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+{n - 1}], ' ')) AS g
  FROM toks, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS u(i)
),
canon AS (
  SELECT g, min(doc_id) AS canon_doc
  FROM pos_grams GROUP BY g HAVING count(*) >= 2
),
win AS (
  SELECT DISTINCT p.doc_id, p.pos
  FROM pos_grams p JOIN canon c USING (g)
  WHERE p.doc_id <> c.canon_doc
),
{strip_tail_sql(n)}
""".strip()


DUP_SPANS_SQL = dup_spans_sql(FIXTURE_SPAN_N)
SPAN_REPORT_SQL = span_report_sql(FIXTURE_SPAN_N)
STRIP_SPANS_SQL = strip_spans_sql(FIXTURE_SPAN_N)
