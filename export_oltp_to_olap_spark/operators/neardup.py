"""Near-duplicate detection: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The training-data-pipeline dedup family (north-star).  Every variant is
expressed as DataFrame ops with deterministic, engine-portable hashing
(md5 hex strings / hex-derived integers), so each one has an exact DuckDB
oracle — the LSH pipelines are oracle-checked end-to-end, not just
smoke-tested.

Scale design (100 TB corpora):

* exact dedup — hash-groupBy on the normalized text (or its md5); partial
  aggregation collapses copies map-side before the shuffle.
* n-gram Jaccard — the shingle inverted index (``doc_id, shingle``) is the
  shuffle key; pair-generation joins docs *through* shingles, so cost is
  Σ df(shingle)² — at corpus scale you cap document frequency (drop
  shingles with df > cutoff, they only generate useless pairs) before the
  self-join.  Exposed via ``max_df``.
* MinHash+LSH — per-doc signatures shrink the pair space to hash-bucket
  collisions: candidates = docs sharing any (band, min-hash) key, then
  exact Jaccard verifies only candidates.  O(docs × H) signature rows
  instead of O(pairs).
* SimHash — constant-size (60-bit) fingerprint per doc; near-dup =
  small Hamming distance.  At scale, band the fingerprint into segments
  (pigeonhole: distance ≤ k → some segment equal) to avoid the full
  cross-join; fixture-scale uses the direct self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import tokens, word_shingles
from export_oltp_to_olap_spark.operators.partitioning import spread_for_compute

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_docs(docs: DataFrame) -> DataFrame:
    """Group exact-duplicate texts: keeper (min doc_id) + group size.

    One row per distinct text — the "keep one copy" step of corpus dedup
    (keeper choice is deterministic).
    """
    return (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keeper_doc_id", "n_copies", "text")
    )


EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies,
       text
FROM documents
GROUP BY text
"""

# ---------------------------------------------------------------------------
# Shingle inverted index + exact n-gram Jaccard
# ---------------------------------------------------------------------------


def shingle_index(docs: DataFrame, n: int = 3, max_df: int | None = None) -> DataFrame:
    """Distinct (doc_id, shingle) pairs; optional document-frequency cap."""
    # Spread BEFORE the explode: the shingle fan-out and the md5s layered
    # on it downstream are the CPU cost, and they must not inherit a
    # single-file input's 1-partition layout.
    idx = (
        spread_for_compute(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", F.explode(word_shingles("text", n)).alias("sh"))
        .distinct()
    )
    if max_df is not None:
        hot = (
            idx.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("sh")
        )
        idx = idx.join(hot, "sh", "left_anti")
    return idx


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.7, max_df: int | None = None
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard ≥ threshold.

    Jaccard = |A∩B| / (|A|+|B|−|A∩B|) — integer counts divided once, so
    the double is identical across engines and the threshold filter is
    exact.
    """
    idx = shingle_index(docs, n, max_df)
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = idx.alias("a"), idx.alias("b")
    common = (
        a.join(b, on=[F.col("a.sh") == F.col("b.sh"), F.col("a.doc_id") < F.col("b.doc_id")])
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "jaccard")
    )


_SHINGLE_CTE = """
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
idx0 AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks
),
shingles AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM idx0 WHERE i + 2 <= len(t)
)
""".strip()

NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.7
"""

# ---------------------------------------------------------------------------
# MinHash + LSH (banded, R=1) with exact-Jaccard verification
# ---------------------------------------------------------------------------

MINHASH_N_HASHES = 16


def doc_shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shs): each document's DISTINCT shingle set as one array.

    The zero-shuffle form of the inverted index: the set lives in a row,
    so signature derivation and pair verification become per-row / per-
    pair array expressions instead of explode→distinct→re-join passes.
    One compact row per doc (~KB) is also the shape that lets AQE
    broadcast the whole map under candidate joins at fixture scale.
    """
    return spread_for_compute(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.array_distinct(word_shingles("text", n)).alias("shs")
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = MINHASH_N_HASHES) -> DataFrame:
    """(doc_id, h, mh): per-doc min of md5("<h>:"+shingle) for each of the
    ``n_hashes`` hash functions.  md5-hex min is an order-total,
    engine-portable MinHash.

    All ``n_hashes`` minima are per-row array reductions over the doc's
    shingle set — no explode, no shuffle, nothing recomputed: H×|set|
    md5s per row, embarrassingly parallel.  The long (doc_id, h, mh)
    shape the LSH join needs is recovered with ``stack`` afterwards.
    """
    def _mh(h: int):
        # NB: a `lambda s, h=h:` default-arg capture would be read by
        # PySpark as a TWO-argument lambda, binding `h` to the array
        # *index* — the closure factory keeps the lambda unary.
        return F.array_min(
            F.transform(F.col("shs"), lambda s: F.md5(F.concat_ws(":", F.lit(h), s)))
        )

    sets = doc_shingle_sets(docs)
    wide = sets.select(
        "doc_id", *[_mh(h).alias(f"mh{h}") for h in range(n_hashes)]
    )
    stack_args = ", ".join(f"{h}, mh{h}" for h in range(n_hashes))
    return wide.select(
        "doc_id", F.expr(f"stack({n_hashes}, {stack_args}) AS (h, mh)")
    )


def minhash_lsh_neardup(
    docs: DataFrame,
    n_hashes: int = MINHASH_N_HASHES,
    threshold: float = 0.8,
) -> DataFrame:
    """LSH candidates (any shared (h, min-hash) band) → exact-Jaccard
    verify → (doc_a, doc_b, jaccard).

    With R=1 bands, P(candidate | jaccard=s) = 1-(1-s)^H; at H=16 and
    s ≥ 0.8 recall is ≥ 1-1e-11 — verification makes precision exact.
    """
    sig = minhash_signatures(docs, n_hashes)
    a, b = sig.alias("a"), sig.alias("b")
    candidates = (
        a.join(
            b,
            on=[
                F.col("a.h") == F.col("b.h"),
                F.col("a.mh") == F.col("b.mh"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # Verify by joining each candidate pair to the two compact per-doc
    # shingle-set rows (AQE broadcasts the small side) and intersecting
    # in-row: shuffle volume ∝ candidates + docs, never candidates ×
    # shingles.
    sets = doc_shingle_sets(docs)
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("shs_a", "shs_b")))
        .withColumn("n_a", F.size("shs_a"))
        .withColumn("n_b", F.size("shs_b"))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "jaccard")
    )


MINHASH_LSH_SQL = f"""
WITH {_SHINGLE_CTE},
sig AS (
  SELECT doc_id, h, min(md5(CAST(h AS VARCHAR) || ':' || sh)) AS mh
  FROM shingles, generate_series(0, {MINHASH_N_HASHES - 1}) AS g(h)
  GROUP BY doc_id, h
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.h = b.h AND a.mh = b.mh AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM candidates c
  JOIN shingles ia ON ia.doc_id = c.doc_a
  JOIN shingles ib ON ib.doc_id = c.doc_b AND ib.sh = ia.sh
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.8
"""

# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex chars → fits a signed 64-bit integer


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over the distinct token set.

    Token hash = first 15 hex chars of md5 → 60-bit integer; fingerprint
    bit b is the majority vote of token bits (strict majority: a 0/0 tie
    votes 0).  Engine-portable: DuckDB derives the same integer via
    CAST('0x'… ), Spark via conv(…, 16, 10).
    """
    tok = (
        spread_for_compute(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", F.explode(tokens("text")).alias("tok"))
        .distinct()
        .withColumn("hv", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"))
    )
    votes = [
        F.sum(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    return per_doc.select("doc_id", fp.alias("simhash"))


def simhash_neardup(docs: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Fixture-scale does the direct self-join on fingerprints (docs² pairs
    over a 1-column table); the 100 TB path bands the 60 bits into
    (max_hamming+1) segments and equi-joins on segment value first.
    """
    fp = simhash_fingerprints(docs)
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_sql_votes() -> str:
    return ",\n         ".join(
        f"sum(((hv >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(SIMHASH_BITS)
    )


def _simhash_sql_fp() -> str:
    return " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )


SIMHASH_FP_CTE = f"""
tok AS (
  SELECT DISTINCT doc_id, unnest(list_filter(
      regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
  FROM documents
),
hv AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS hv FROM tok
),
votes AS (
  SELECT doc_id,
         {_simhash_sql_votes()}
  FROM hv GROUP BY doc_id
),
fp AS (
  SELECT doc_id, {_simhash_sql_fp()} AS simhash FROM votes
)
""".strip()

SIMHASH_FP_SQL = f"""
WITH {SIMHASH_FP_CTE}
SELECT doc_id, simhash FROM fp
"""

SIMHASH_NEARDUP_SQL = f"""
WITH {SIMHASH_FP_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
"""
