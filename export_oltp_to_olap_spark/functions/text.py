"""Text-analysis column builders: tokens, shingles, quality, lang-ID,
fingerprints.

All pure Spark SQL expressions (codegen'd, no UDFs) with exact DuckDB
equivalents — the north-star text operators are oracle-checked, not just
smoke-tested.  Conventions shared with the SQL side:

* tokens: ``lower(text)`` split on ``[^a-z0-9]+``, empties dropped
* shingles: n-token sliding windows joined by one space
* hashes: ``md5`` hex strings (identical in Spark/DuckDB/Python)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Marker stopwords per language for the n-gram/stopword lang-ID heuristic.
# Counting is word-boundary regexp matches over the lowercased text.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "les", "et", "des"),
    "de": ("der", "die", "das", "und", "ist"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """ARRAY<STRING> of normalized word tokens."""
    return F.filter(F.split(F.lower(_c(text)), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """ARRAY<STRING> of n-token shingles (may contain duplicates).

    Delegates to :func:`shingles_from_tokens` over :func:`tokens` —
    ONE home for the construction and its short-document guard, so the
    two forms cannot drift.  Since the r14 ``zip_with`` rewrite the
    expression tree differs from the historical inline
    ``transform(sequence, …)`` form (value-identical, different —
    faster — plan; see :func:`shingles_from_tokens`).
    """
    return shingles_from_tokens(tokens(text), n)


def shingles_from_tokens(toks: Column, n: int) -> Column:
    """`word_shingles` semantics over an ALREADY-TOKENIZED array column
    — the tokenize-once form for callers deriving several n-gram widths
    from one persisted token array (`decontam_threshold_curve`: five
    corpus text passes → one).  Same short-document guard: fewer than
    ``n`` tokens yields an empty array.

    Construction: ``zip_with`` over n SHIFTED slices of the token array
    (shingle i = toks[i] ⊕ toks[i+1] ⊕ … ⊕ toks[i+n−1]), NOT a
    ``transform(sequence(1, L), i -> concat_ws(slice(toks, i, n)))``.
    The two are value-identical, but in the transform form the lambda
    body references ``toks`` — and higher-order-function lambdas are
    interpreted with NO common-subexpression elimination, so a caller
    that passes an un-projected expression (``word_shingles`` passes
    the regex tokenizer itself) re-evaluates it once PER SHINGLE.
    Measured at sf0.1 (5000 docs, ~45 tokens each): 3.97 s → 0.75 s for
    the full shingle build, identical output (optimization r14; the
    zip_with lambdas reference only their own elements, so ``toks`` is
    evaluated a bounded n+2 times per row regardless of caller shape).
    """
    length = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    make = F.slice(toks, 1, length)
    for k in range(2, n + 1):
        make = F.zip_with(
            make, F.slice(toks, k, length), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(toks) >= n, make).otherwise(F.array().cast("array<string>"))


def max_multiplicity(arr: Column) -> Column:
    """Largest multiplicity of any element of a STRING array (0 for an
    empty array): ``sort_array`` + ONE ``aggregate`` pass whose
    accumulator tracks (previous element, current equal-run length,
    best run) — O(L log L) per row.  The obvious
    ``array_distinct``×``filter`` double scan is per-row O(L²), the
    straggler-task shape VERDICT r9 flagged on long documents; every
    repetition metric (Gopher top-bigram, `text_repetition`) goes
    through this helper instead.

    PRECONDITION — elements must be non-NULL: ``sort_array`` places
    NULLs first and ``x == prev`` is NULL for them, so each NULL resets
    the run and a NULL-heavy array would report multiplicity 1, not the
    NULL count.  Every current caller feeds token/bigram arrays built
    by ``split``/``transform`` (never NULL elements); callers with
    nullable elements must pre-filter with
    ``F.filter(arr, lambda x: x.isNotNull())``."""
    _run = lambda acc, x: F.when(  # noqa: E731 — local fold step
        x == acc["prev"], acc["run"] + F.lit(1).cast("long")
    ).otherwise(F.lit(1).cast("long"))
    return F.aggregate(
        F.sort_array(arr),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            _run(acc, x).alias("run"),
            F.greatest(acc["best"], _run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-stopword hit counts per language (LongType)."""
    lowered = F.lower(_c(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(markers) + r")\b"
        out[lang] = F.regexp_count(lowered, F.lit(pattern)).cast("long")
    return out


def lang_predict(text: Column | str) -> Column:
    """Argmax language with deterministic tiebreak (first in LANG_MARKERS
    order wins); 'und' (undetermined) when no marker matches."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs overwrite later → first-wins
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best == 0, F.lit("und")).otherwise(pred)


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features à la large-corpus filtering pipelines:
    length, token stats, punctuation/digit/space ratios, stopword ratio.
    All ratios are int-count / int-count divisions → engine-identical."""
    t = _c(text)
    n_chars = F.length(t).cast("long")
    toks = tokens(t)
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("long")
    n_digits = (n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("long")
    n_spaces = (n_chars - F.length(F.regexp_replace(t, r"\s", ""))).cast("long")
    n_stop = F.regexp_count(F.lower(t), F.lit(r"\b(the|a|and|of|is|to|in)\b")).cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_distinct_tokens": n_distinct,
        # greatest(n_chars, 1): empty/NULL text must yield 0-ish ratios,
        # not an ANSI divide-by-zero (fixture docs are never empty, so
        # oracle values are unchanged; the SQL side carries the same guard)
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "digit_ratio": n_digits / F.greatest(n_chars, F.lit(1)),
        "space_ratio": n_spaces / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": n_stop / F.greatest(n_tokens, F.lit(1)),
        "distinct_ratio": n_distinct / F.greatest(n_tokens, F.lit(1)),
    }


def quality_score(text: Column | str) -> Column:
    """Scalar [0,1]-ish quality score: weighted blend of the features.

    The weights are arbitrary but fixed; the SQL oracle states the same
    formula in the same operation order so doubles match exactly.
    """
    f = quality_features(text)
    return (
        F.lit(0.4) * f["distinct_ratio"]
        + F.lit(0.3) * f["stopword_ratio"]
        + F.lit(0.2) * (F.lit(1.0) - f["punct_ratio"])
        + F.lit(0.1) * (F.lit(1.0) - f["digit_ratio"])
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set (a deterministic stand-in for a rolling-hash fingerprint;
    md5 agrees byte-for-byte across Spark/DuckDB)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


# SQL fragments mirroring the above, for oracle assembly -----------------------

SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower({t}), '[^a-z0-9]+'), x -> x <> '')"
)


def sql_lang_count(lang: str) -> str:
    pattern = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return f"CAST(len(regexp_extract_all(lower(text), '{pattern}')) AS BIGINT)"
