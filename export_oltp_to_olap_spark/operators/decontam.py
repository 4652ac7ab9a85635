"""Benchmark decontamination: n-gram overlap between corpus and eval set.

Training corpora must not contain the benchmarks they are evaluated on.
The standard recipe (GPT-3 appendix C; Llama 2 §A.6; The Pile) is
n-gram collision: a training document is contaminated when it shares at
least one word n-gram (13-grams in the published pipelines; ``n`` is a
parameter here and the fixture queries use 4 so short synthetic docs
can collide at all) with any document in the held-out / benchmark set.

Shape (all built-in expressions, no UDFs):

1. Split the corpus with the deterministic hash splitter
   (`operators/sampling.assign_splits`) — the ``test`` split stands in
   for the external benchmark set in the fixture harness; production
   calls take any (id, text) eval DataFrame.
2. Eval side: distinct n-gram set, md5-hashed to fixed-width join keys
   (engine-portable, and a 32-hex string regardless of n-gram width).
3. Corpus side: per-doc DISTINCT n-grams (`array_distinct` map-side,
   so a doc repeating one benchmark phrase 100× still counts once),
   exploded to (doc_id, gram) rows.
4. LEFT join corpus grams → broadcast eval grams; one aggregation per
   doc yields both the gram total and the hit count.

Scale: the eval set is benchmark-sized (thousands of docs — tiny next
to a 100 TB corpus), so its distinct-gram set is explicitly
``broadcast()``: the corpus side is scanned once, map-side, with no
shuffle of the exploded grams except the final per-doc count
(partial-aggregated on doc_id).  Never join the other way around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.functions.text import (
    shingles_from_tokens,
    tokens,
    word_shingles,
)
from export_oltp_to_olap_spark.operators.partitioning import spread_for_compute
from export_oltp_to_olap_spark.operators.sampling import _BUCKETS, assign_splits

# Fixture n: published pipelines use 13-grams; the synthetic docs are
# short, and n=4 is the smallest width that still yields a selective,
# non-vacuous contaminated set at the driver scale (52 docs at sf0.01;
# n=5 leaves 4, n=3 flags most of the corpus).
FIXTURE_N = 4


def eval_ngram_set(eval_docs: DataFrame, n: int = FIXTURE_N, text_col: str = "text") -> DataFrame:
    """Distinct md5(n-gram) keys of the eval/benchmark documents.

    One column ``g``; small enough to broadcast by contract (benchmark
    suites are ~10^5 docs; their distinct-gram set is a few hundred MB
    at worst — if a caller ever feeds a huge "eval" set, drop the
    broadcast hint at the call site and let AQE pick the join).
    """
    return (
        spread_for_compute(eval_docs.select(text_col))
        .select(F.explode(F.array_distinct(word_shingles(text_col, n))).alias("gram"))
        .select(F.md5("gram").alias("g"))
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = FIXTURE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-doc overlap with the eval n-gram set.

    Returns one row per contaminated doc (n_overlap ≥ 1):
    ``(doc_id, n_ngrams, n_overlap, overlap_ratio)`` where ``n_ngrams``
    is the doc's DISTINCT n-gram count and ``overlap_ratio`` the
    contaminated fraction of it, rounded to 6 decimals.  Docs with
    fewer than ``n`` tokens have no n-grams and can never be flagged.
    """
    grams = F.array_distinct(word_shingles(text_col, n))
    # No size(grams) column anywhere: carrying it next to the explode
    # tempts Catalyst's CollapseProject into re-evaluating the FULL
    # tokenize+shingle expression per EXPLODED row (verified in the
    # optimized plan: size() collapsed above the Generate — 12 s instead
    # of ~1 s at sf0.1).  Both counts instead fall out of one LEFT join:
    # n_ngrams = rows per doc (the exploded array is already distinct),
    # n_overlap = matched rows per doc.
    corpus_grams = (
        spread_for_compute(corpus.select(id_col, text_col), id_col)
        .select(F.col(id_col), F.explode(grams).alias("gram"))
        .select(id_col, F.md5("gram").alias("g"))
    )
    eval_grams = eval_ngram_set(eval_docs, n, text_col).withColumn("hit", F.lit(1))
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_overlap"),
        )
        .where(F.col("n_overlap") >= 1)
    )
    return hits.select(
        F.col(id_col),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        F.round(F.col("n_overlap") / F.col("n_ngrams"), 6).alias("overlap_ratio"),
    ).orderBy(id_col)


def train_eval_split(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The fixture (train, eval) pair: hash-split the corpus and let the
    ``test`` split stand in for the external benchmark set.  ONE home
    for this convention — both decontamination faces and their tests
    must decontaminate against the same eval set or the shared-oracle
    contract silently breaks."""
    assigned = assign_splits(docs, "doc_id")
    train = assigned.where(F.col("split") == "train").drop("split")
    eval_docs = assigned.where(F.col("split") == "test").drop("split")
    return train, eval_docs


def decontaminate_docs(docs: DataFrame, n: int = FIXTURE_N) -> DataFrame:
    """Fixture-shaped entry: flag ``train``-split docs sharing any word
    ``n``-gram with the ``test`` split (the stand-in benchmark set).

    Self-contained on the documents table so the driver can oracle-check
    it; production callers use `contamination_hits` with a real
    benchmark DataFrame.
    """
    train, eval_docs = train_eval_split(docs)
    return contamination_hits(train, eval_docs, n=n)


_TRAIN_BOUND = int(0.8 * _BUCKETS)
_VAL_BOUND = int(0.9 * _BUCKETS)


def decontam_sql(n: int = FIXTURE_N) -> str:
    """DuckDB restatement of `decontaminate_docs` at the same ``n``."""
    return f"""
WITH assigned AS (
  SELECT doc_id, text,
         CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
           AS bucket
  FROM documents
),
toks AS (
  SELECT doc_id, bucket,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM assigned
),
grams AS (
  SELECT doc_id, bucket,
         list_distinct(list_transform(generate_series(1, greatest(len(t) - {n - 1}, 0)),
                                      i -> array_to_string(t[i:i+{n - 1}], ' '))) AS gs
  FROM toks
),
eval_grams AS (
  SELECT DISTINCT md5(u.g) AS g
  FROM grams, unnest(gs) AS u(g)
  WHERE bucket >= {_VAL_BOUND}
),
train_grams AS (
  SELECT doc_id, len(gs) AS n_ngrams, md5(u.g) AS g
  FROM grams, unnest(gs) AS u(g)
  WHERE bucket < {_TRAIN_BOUND}
)
SELECT doc_id,
       CAST(n_ngrams AS BIGINT) AS n_ngrams,
       CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*) / n_ngrams, 6) AS overlap_ratio
FROM train_grams JOIN eval_grams USING (g)
GROUP BY doc_id, n_ngrams
ORDER BY doc_id
"""


DECONTAM_SQL = decontam_sql(FIXTURE_N)


def strip_contaminated_spans(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = FIXTURE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    rewrite_docs: DataFrame | None = None,
) -> DataFrame:
    """Surgical decontamination (the REWRITE face): cut every n-token
    window that collides with the eval n-gram set out of the corpus
    text, instead of dropping whole documents — the Llama-2 §A.6 move
    for documents that are mostly clean but quote a benchmark item.
    Overlapping contaminated windows island-merge into one cut
    (`substring.strip_window_positions`, the span-dedup rewrite tail).

    ``rewrite_docs`` (optional, default = the whole corpus) restricts
    which docs' windows are PROBED for eval collisions; docs outside it
    still appear in the output, normalized but never cut.  Callers
    whose corpus contains the eval split itself (e.g. a curation chain
    rewriting admitted docs under the fixture convention where the test
    split IS the eval set) pass the train/val subset here so eval-split
    docs don't self-annihilate (ADVICE r8).

    Output matches `strip_duplicated_spans`: ``(doc_id, n_tokens,
    removed_tokens, kept_tokens, clean_text)`` for EVERY corpus doc,
    clean_text being the normalized kept-token stream.

    Scale: eval grams broadcast (the module's standing contract); the
    corpus gram stream is scanned once map-side; removal fan-out is one
    row per removed token.
    """
    from export_oltp_to_olap_spark.operators.substring import strip_window_positions

    probe = corpus if rewrite_docs is None else rewrite_docs
    pg = (
        spread_for_compute(probe.select(id_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.posexplode(word_shingles(text_col, n)).alias("p0", "gram"),
        )
        .select(id_col, (F.col("p0") + 1).alias("pos"), F.md5("gram").alias("g"))
    )
    win = (
        pg.join(F.broadcast(eval_ngram_set(eval_docs, n, text_col)), "g")
        .select(id_col, "pos")
        .distinct()
    )
    return strip_window_positions(corpus, win, n, id_col, text_col)


def decontaminated_strip_rewrite(docs: DataFrame, n: int = FIXTURE_N) -> DataFrame:
    """Fixture-shaped entry: rewrite the ``train`` split with ``test``-
    split n-gram windows cut out (same split convention as
    `decontaminate_docs`, so the two faces describe the same
    contamination)."""
    train, eval_docs = train_eval_split(docs)
    return strip_contaminated_spans(train, eval_docs, n=n)


def decontam_strip_sql(n: int = FIXTURE_N) -> str:
    """DuckDB restatement of `decontaminated_strip_rewrite` at the same
    ``n`` — split CTEs from `decontam_sql`, rewrite tail from
    `substring.strip_tail_sql`."""
    from export_oltp_to_olap_spark.operators.substring import strip_tail_sql

    return f"""
WITH assigned AS (
  SELECT doc_id, text,
         CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
           AS bucket
  FROM documents
),
toks_all AS (
  SELECT doc_id, bucket,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM assigned
),
toks AS (SELECT doc_id, t FROM toks_all WHERE bucket < {_TRAIN_BOUND}),
eval_grams AS (
  SELECT DISTINCT md5(array_to_string(t[i:i+{n - 1}], ' ')) AS g
  FROM toks_all, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS u(i)
  WHERE bucket >= {_VAL_BOUND}
),
pos_grams AS (
  SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+{n - 1}], ' ')) AS g
  FROM toks, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS u(i)
),
win AS (
  SELECT DISTINCT p.doc_id, p.pos FROM pos_grams p JOIN eval_grams USING (g)
),
{strip_tail_sql(n)}
""".strip()


DECONTAM_STRIP_SQL = decontam_strip_sql(FIXTURE_N)


# ---------------------------------------------------------------------------
# Stateless per-row contamination flag (the streaming-safe form)
# ---------------------------------------------------------------------------


MAX_EVAL_GRAMS = 16_777_216  # collect guard: 2^24 × 8 B = 128 MB on the driver


def eval_gram_hashes(eval_docs: DataFrame, n: int = FIXTURE_N, text_col: str = "text"):
    """The eval set's distinct n-grams as a sorted int64 numpy array.

    Collected to the driver — bounded by the same contract that lets
    `contamination_hits` broadcast the set (benchmark suites are MBs,
    not TBs); xxhash64 keys keep it 8 bytes/gram.  The sorted array is
    what `flag_contaminated`'s vectorized membership test searches.
    The contract is ENFORCED, not assumed: more than ``MAX_EVAL_GRAMS``
    distinct grams fails loudly before the driver can OOM (the
    `ann_index.MAX_ROUTING_ROWS` pattern) — a caller with a larger eval
    suite should decontaminate per-benchmark or switch to the join-side
    `contamination_hits` report, which never collects.

    The driver transfer is Arrow (``limit(cap+1).toPandas()`` — ONE
    bounded job): at most cap+1 int64 keys cross as a columnar batch,
    so the 128 MB budget in the cap's comment is the ACTUAL driver
    footprint — a row-object ``collect()`` of the same 2^24 keys would
    be several GB of Python ``Row``s and could OOM the guard itself
    (ADVICE r5); the limit makes the overflow check itself memory-safe.
    """
    import numpy as np

    grams = (
        eval_docs.select(
            F.explode(F.array_distinct(word_shingles(text_col, n))).alias("gram")
        )
        .select(F.xxhash64("gram").alias("h"))
        .distinct()
        .limit(MAX_EVAL_GRAMS + 1)
    )
    vals = grams.toPandas()["h"].to_numpy(dtype="int64")
    if len(vals) > MAX_EVAL_GRAMS:
        raise ValueError(
            f"eval set exceeds {MAX_EVAL_GRAMS} distinct {n}-grams — the "
            f"broadcast decontamination path is for MB-scale benchmark "
            f"suites; split the eval set per benchmark or use the "
            f"join-based contamination_hits report instead"
        )
    return np.sort(vals)


def save_eval_hashes(hashes, path: str) -> None:
    """Persist the standing eval-gram artifact (sorted int64 xxhash64
    keys) as a single-column parquet file — the compute-once half of the
    compute-once / reuse-per-batch contract (`cli.py eval-hashes`).
    Parquet (not npy/pickle) so any engine can audit the artifact."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    papq.write_table(
        pa.table({"h": pa.array([int(v) for v in hashes], type=pa.int64())}), path
    )


def load_eval_hashes(path: str):
    """Read a :func:`save_eval_hashes` artifact back into the sorted
    int64 array :func:`flag_contaminated` expects."""
    import numpy as np
    import pyarrow.parquet as papq

    return np.sort(papq.read_table(path)["h"].to_numpy().astype("int64", copy=False))


def flag_contaminated(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    n: int = FIXTURE_N,
    text_col: str = "text",
    eval_hashes=None,
) -> DataFrame:
    """Append a boolean ``contaminated`` column: does the doc share any
    word n-gram with the eval set?

    Unlike `contamination_hits` (join + per-doc agg — the batch report
    shape), this is a stateless per-row expression: STREAMING-SAFE in
    any output mode, no shuffle, no state, no stream-stream join.  The
    eval set ships to executors as a Spark broadcast of a sorted int64
    hash array; membership is one vectorized ``np.isin`` per Arrow
    batch (grams of the whole batch flattened once — no per-row Python
    dispatch).  Decisions agree with `contamination_hits` doc-for-doc
    (both compare the same normalized n-grams; only the key hash
    differs: md5 for the SQL oracle, xxhash64 here for 8-byte keys).

    ``eval_hashes`` (an :func:`eval_gram_hashes` array) lets the
    steady-state ingest path compute the eval set ONCE and reuse it per
    delta batch / stream start — the standing eval-gram artifact; when
    given, ``eval_docs`` is ignored and nothing re-shingles the eval
    suite.
    """
    from pyspark.sql.functions import pandas_udf

    evals = (
        eval_hashes
        if eval_hashes is not None
        else eval_gram_hashes(eval_docs, n, text_col)
    )
    bc = docs.sparkSession.sparkContext.broadcast(evals)

    @pandas_udf("boolean")
    def any_hit(gram_hashes):
        import numpy as np
        import pandas as pd

        if len(gram_hashes) == 0:
            return pd.Series([], dtype="bool")
        table = bc.value
        lens = gram_hashes.str.len().fillna(0).astype("int64").to_numpy()
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(gram_hashes), dtype=bool))
        flat = np.concatenate(
            [np.asarray(v, dtype="int64") for v in gram_hashes if v is not None and len(v)]
        )
        hits = np.isin(flat, table)
        out = np.zeros(len(gram_hashes), dtype=bool)
        pos = np.nonzero(lens)[0]
        bounds = np.cumsum(lens[pos])
        start = 0
        for i, end in zip(pos, bounds):
            out[i] = hits[start:end].any()
            start = end
        return pd.Series(out)

    gram_hashes = F.transform(
        F.array_distinct(word_shingles(text_col, n)), lambda g: F.xxhash64(g)
    )
    return docs.withColumn("contaminated", any_hit(gram_hashes))


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination — the beyond-broadcast scale path
# ---------------------------------------------------------------------------
#
# `contamination_hits` broadcasts the eval gram SET (exact, but bounded
# by executor memory) and `flag_contaminated` broadcasts it as a sorted
# hash array capped at MAX_EVAL_GRAMS.  When the "eval" side outgrows
# both — decontaminating against an entire held-out corpus rather than
# a benchmark suite — the exact join would shuffle EVERY exploded train
# gram.  The classic fix is a two-phase Bloom prefilter:
#
#   1. build a fixed-size bitmap over the eval grams (size chosen by
#      false-positive budget, INDEPENDENT of eval cardinality),
#   2. probe it map-side over the train gram stream (vectorized Arrow
#      batches — drops ~everything),
#   3. exact-verify only the surviving candidates with the real join,
#      which removes every false positive.
#
# Phase 3 makes the result bit-identical to `contamination_hits` (the
# same DuckDB oracle hash-checks both), while the only full-corpus
# shuffle left is the per-doc COUNT — the candidate join moves a few
# hits instead of the whole gram stream.  Bloom filters cannot produce
# false negatives when probe and build share the hash family, which
# they do by construction here (both sides compute the same two
# xxhash64 columns in Spark; Kirsch-Mitzenmacher double hashing derives
# the k probes).

BLOOM_M_BITS = 1 << 24  # fixture default: 2 MiB bitmap
BLOOM_K = 5


def _bloom_positions(h1, h2, m_bits: int, k: int):
    """(k, n) bit positions via double hashing: ``(h1 + i*h2) mod m``.

    Shared by build and probe so the two can never drift.  ``m_bits``
    must be a power of two (the mod is a mask; uint64 wraparound is the
    intended modular arithmetic)."""
    import numpy as np

    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    u1 = np.asarray(h1, dtype="int64").view("uint64")
    u2 = np.asarray(h2, dtype="int64").view("uint64")
    ks = np.arange(k, dtype="uint64")[:, None]
    return ((u1[None, :] + ks * u2[None, :]) & np.uint64(m_bits - 1)).astype("int64")


def _gram_hash_cols(gram_col: str = "gram"):
    """The two independent 64-bit gram hashes (build ≡ probe)."""
    return (
        F.xxhash64(gram_col).alias("h1"),
        F.xxhash64(F.lit("bloom:"), F.col(gram_col)).alias("h2"),
    )


def eval_gram_bloom(
    eval_docs: DataFrame,
    n: int = FIXTURE_N,
    text_col: str = "text",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
):
    """Bloom bitmap (packed uint8 numpy array, ``m_bits/8`` bytes) over
    the eval set's distinct n-grams.

    Built distributively: each partition folds its grams into a local
    bitmap inside one ``mapInPandas`` pass (no shuffle, no gram ever
    leaves its partition), and the driver ORs the per-partition bitmaps.
    Driver transfer is ``partitions × m_bits/8`` bytes and the standing
    footprint is ``m_bits/8`` — both INDEPENDENT of eval cardinality,
    which is the whole point: this is the eval-side structure that
    still fits when `MAX_EVAL_GRAMS` does not.  At cluster scale with a
    large ``m_bits``, repartition the gram stream to a handful of
    partitions first (or tree-aggregate) to bound the OR fan-in.
    """
    import numpy as np
    import pandas as pd

    from export_oltp_to_olap_spark import shipping

    # Fail fast on the driver: _bloom_positions re-checks on executors,
    # but an invalid geometry should not cost a launched Spark job.
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")

    # the build closure calls the module-level _bloom_positions on
    # executors — the package must travel with the job
    shipping.ensure_shipped(eval_docs.sparkSession)

    grams = (
        spread_for_compute(eval_docs.select(text_col))
        .select(F.explode(F.array_distinct(word_shingles(text_col, n))).alias("gram"))
        .select(*_gram_hash_cols())
    )

    def build(batches):
        bm = np.zeros(m_bits // 8, dtype="uint8")
        for pdf in batches:
            if not len(pdf):
                continue
            pos = _bloom_positions(pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), m_bits, k)
            flat = pos.ravel()
            np.bitwise_or.at(
                bm, flat >> 3, (np.uint8(1) << (flat & 7).astype("uint8"))
            )
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = grams.mapInPandas(build, "bm binary").toPandas()
    out = np.zeros(m_bits // 8, dtype="uint8")
    for b in parts["bm"]:
        out |= np.frombuffer(b, dtype="uint8")
    return out


def save_eval_bloom(bitmap, path: str, k: int = BLOOM_K) -> None:
    """Persist an :func:`eval_gram_bloom` bitmap as a one-row parquet
    artifact carrying its own (m_bits, k) — the compute-once half of
    the compute-once / reuse-per-batch contract, mirroring
    `save_eval_hashes`.  Parquet (not npy/pickle) so any engine can
    audit the artifact."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    papq.write_table(
        pa.table(
            {
                "bm": pa.array([bytes(bitmap)], type=pa.binary()),
                "m_bits": pa.array([len(bitmap) * 8], type=pa.int64()),
                "k": pa.array([k], type=pa.int64()),
            }
        ),
        path,
    )


def load_eval_bloom(path: str):
    """Read a :func:`save_eval_bloom` artifact back: (bitmap, m_bits, k)."""
    import numpy as np
    import pyarrow.parquet as papq

    t = papq.read_table(path)
    bm = np.frombuffer(t["bm"][0].as_py(), dtype="uint8")
    return bm, int(t["m_bits"][0].as_py()), int(t["k"][0].as_py())


def contamination_hits_bloom(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = FIXTURE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    bloom=None,
) -> DataFrame:
    """`contamination_hits`, Bloom-prefiltered: identical output (the
    exact verify join removes every false positive — one oracle checks
    both faces), different cost shape.

    The corpus is scanned ONCE: the probe verdict rides the exploded
    gram stream as a column, and one per-doc aggregation yields both the
    gram total and the (tiny) candidate-gram list, which then explodes
    into the exact verify join.  Each stage's cost: full gram stream
    map-side (scan + shingle + probe), one doc_id shuffle of per-doc
    partials, then a join that moves ONLY the bloom survivors.  The
    candidate→eval join is left UNHINTED: at fixture scale AQE
    broadcasts it anyway, at the scale this path exists for (eval too
    big to broadcast) it becomes a shuffle join of the few survivors
    against the eval grams — never of the full corpus gram stream.

    ``bloom`` accepts a prebuilt bitmap — the standing-artifact form
    (compute the eval structure once, reuse per batch), mirroring
    ``flag_contaminated(eval_hashes=…)``.  It must be the
    :func:`load_eval_bloom` triple ``(bm, m_bits, k)`` so the
    artifact's own geometry is used for probing: a bare array is
    REJECTED, because the byte length pins ``m_bits`` but not ``k``,
    and probing with a larger k than the build silently yields false
    negatives — missed contamination, the one failure mode the Bloom
    contract forbids.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from export_oltp_to_olap_spark import shipping

    # the probe closure calls the module-level _bloom_positions on
    # executors — the package must travel with the job
    shipping.ensure_shipped(corpus.sparkSession)

    if bloom is None:
        bm = eval_gram_bloom(eval_docs, n, text_col, m_bits, k)
    elif isinstance(bloom, tuple) and len(bloom) == 3:
        bm, m_bits, k = bloom  # the load_eval_bloom triple carries its geometry
    else:
        raise TypeError(
            "prebuilt bloom must be the load_eval_bloom (bm, m_bits, k) "
            "triple — a bare bitmap cannot carry its build-time k, and a "
            "k mismatch between build and probe silently produces false "
            "negatives (missed contamination)"
        )
    if len(bm) != m_bits // 8:
        raise ValueError(
            f"bitmap is {len(bm)} bytes, expected {m_bits // 8} — a "
            f"non-default artifact must be passed as the load_eval_bloom "
            f"(bm, m_bits, k) triple so probe geometry matches the build"
        )
    bc = corpus.sparkSession.sparkContext.broadcast(bm)

    @pandas_udf("boolean")
    def might_contain(h1s, h2s):
        table = bc.value
        if not len(h1s):
            return pd.Series([], dtype="bool")
        pos = _bloom_positions(h1s.to_numpy(), h2s.to_numpy(), m_bits, k)
        bits = (np.uint8(1) << (pos & 7).astype("uint8"))
        hits = (table[pos >> 3] & bits) != 0
        return pd.Series(hits.all(axis=0))

    corpus_grams = (
        spread_for_compute(corpus.select(id_col, text_col), id_col)
        .select(F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col, n))).alias("gram"))
        .select(id_col, F.md5("gram").alias("g"), *_gram_hash_cols())
    )
    # ONE pass over the gram stream: probe verdict as a column, then a
    # single per-doc agg producing the total AND the candidate list
    # (collect_list skips the when()'s nulls; its size is bounded by
    # true hits + fpp·n_ngrams, i.e. tiny).  Two independent branches
    # here would re-scan and re-shingle the whole corpus — the branches
    # diverge before any exchange, so ReuseExchange cannot merge them.
    per_doc = (
        corpus_grams.withColumn("cand", might_contain("h1", "h2"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.collect_list(F.when(F.col("cand"), F.col("g"))).alias("cand_g"),
        )
    )
    hits = (
        per_doc.select(id_col, "n_ngrams", F.explode("cand_g").alias("g"))
        .join(eval_ngram_set(eval_docs, n, text_col), "g")
        .groupBy(id_col, "n_ngrams")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return hits.select(
        F.col(id_col),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        F.round(F.col("n_overlap") / F.col("n_ngrams"), 6).alias("overlap_ratio"),
    ).orderBy(id_col)


def decontaminate_docs_bloom(docs: DataFrame, n: int = FIXTURE_N) -> DataFrame:
    """Fixture-shaped Bloom face of `decontaminate_docs`: same splits
    (`train_eval_split`), same output, same ORACLE (`decontam_sql` —
    the exact verify makes the prefilter invisible in the result)."""
    train, eval_docs = train_eval_split(docs)
    return contamination_hits_bloom(train, eval_docs, n=n)


def eval_contamination_report(docs: DataFrame, n: int = FIXTURE_N) -> DataFrame:
    """Per-BENCHMARK-doc leakage — the flip side of
    `decontaminate_docs`: for each eval/benchmark document, how many of
    its distinct word n-grams appear anywhere in the train split
    (``leaked_grams``) and how many distinct train docs quote at least
    one of them (``quoting_train_docs``).  This is the report an eval
    owner reads to rank WHICH benchmark items are compromised (GPT-3
    appendix C publishes exactly this per-benchmark "dirty" breakdown),
    where the corpus-side face answers which TRAINING docs to drop.

    ``(eval_id, n_eval_grams, leaked_grams, quoting_train_docs)``
    ordered by eval_id; eval docs shorter than ``n`` tokens have no
    n-grams and (like every gram face) do not appear.

    Scale: the eval side is benchmark-sized and broadcast (the module's
    standing contract — never shuffle the corpus side); the train gram
    stream is scanned once map-side, and only the hit rows (bounded by
    actual leakage) reach the per-eval aggregate.
    """
    train, eval_docs = train_eval_split(docs)
    eg = (
        spread_for_compute(eval_docs.select("doc_id", "text"), "doc_id")
        .select(
            F.col("doc_id").alias("eval_id"),
            F.explode(F.array_distinct(word_shingles("text", n))).alias("gram"),
        )
        .select("eval_id", F.md5("gram").alias("g"))
    )
    tg = (
        spread_for_compute(train.select("doc_id", "text"), "doc_id")
        .select(
            F.col("doc_id").alias("train_id"),
            F.explode(F.array_distinct(word_shingles("text", n))).alias("gram"),
        )
        .select("train_id", F.md5("gram").alias("g"))
    )
    per_eval = eg.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_grams")
    )
    hits = tg.join(F.broadcast(eg), "g")
    agg = hits.groupBy("eval_id").agg(
        F.countDistinct("g").cast("long").alias("leaked_grams"),
        F.countDistinct("train_id").cast("long").alias("quoting_train_docs"),
    )
    # both sides of the final join are eval-sized (one row per
    # benchmark doc) — broadcast by the same contract as the gram set
    return (
        per_eval.join(F.broadcast(agg), "eval_id", "left")
        .select(
            "eval_id",
            "n_eval_grams",
            F.coalesce("leaked_grams", F.lit(0)).cast("long").alias("leaked_grams"),
            F.coalesce("quoting_train_docs", F.lit(0))
            .cast("long")
            .alias("quoting_train_docs"),
        )
        .orderBy("eval_id")
    )


def eval_contamination_sql(n: int = FIXTURE_N) -> str:
    """DuckDB restatement of `eval_contamination_report`."""
    return f"""
WITH assigned AS (
  SELECT doc_id, text,
         CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
           AS bucket
  FROM documents
),
toks AS (
  SELECT doc_id, bucket,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM assigned
),
grams AS (
  SELECT doc_id, bucket,
         list_distinct(list_transform(generate_series(1, greatest(len(t) - {n - 1}, 0)),
                                      i -> array_to_string(t[i:i+{n - 1}], ' '))) AS gs
  FROM toks
),
eval_grams AS (
  SELECT doc_id AS eval_id, md5(u.g) AS g
  FROM grams, unnest(gs) AS u(g)
  WHERE bucket >= {_VAL_BOUND}
),
train_grams AS (
  SELECT doc_id AS train_id, md5(u.g) AS g
  FROM grams, unnest(gs) AS u(g)
  WHERE bucket < {_TRAIN_BOUND}
),
per_eval AS (
  SELECT eval_id, CAST(count(*) AS BIGINT) AS n_eval_grams
  FROM eval_grams GROUP BY eval_id
),
agg AS (
  SELECT e.eval_id,
         CAST(count(DISTINCT e.g) AS BIGINT) AS leaked_grams,
         CAST(count(DISTINCT t.train_id) AS BIGINT) AS quoting_train_docs
  FROM eval_grams e JOIN train_grams t USING (g)
  GROUP BY e.eval_id
)
SELECT p.eval_id, p.n_eval_grams,
       CAST(COALESCE(a.leaked_grams, 0) AS BIGINT) AS leaked_grams,
       CAST(COALESCE(a.quoting_train_docs, 0) AS BIGINT) AS quoting_train_docs
FROM per_eval p LEFT JOIN agg a USING (eval_id)
ORDER BY p.eval_id
""".strip()


EVAL_CONTAMINATION_SQL = eval_contamination_sql(FIXTURE_N)


# ---------------------------------------------------------------------------
# n-gram window calibration curve
# ---------------------------------------------------------------------------

DECONTAM_CURVE_NS = (3, 4, 5, 6, 8)


def decontam_threshold_curve(
    docs: DataFrame, ns: tuple[int, ...] = DECONTAM_CURVE_NS
) -> DataFrame:
    """Contamination volume as a function of the n-gram WINDOW SIZE —
    the calibration card behind "which n do we decontaminate at?"
    (GPT-3 used 13-grams, Llama 2 reports token-level 10-grams; too
    small over-flags common phrases, too large misses paraphrase-length
    quotes).  For each ``n``: how many train docs share at least one
    word n-gram with the eval split, and how many distinct eval grams
    leak.  ``(n, n_train_docs_flagged, n_leaked_grams)`` — integers
    only, same split convention as every decontamination face
    (`train_eval_split`).

    Scale shape: the token ARRAYS are computed once and persisted —
    each curve point derives its grams from the cached arrays
    (`shingles_from_tokens`), so the corpus text is tokenized in ONE
    pass instead of |ns| (VERDICT r11 item 5: the docstring claimed
    tokenize-once while the persist only covered the raw text).  Each
    point is then a map-side distinct-gram fan-out + one gram-keyed
    join + a 1-row aggregate — the registered `decontaminate_documents`
    shape repeated |ns| times with the smaller output.  The 5-row
    result is localCheckpointed eagerly and the token cache unpersisted
    before returning, so no audit-face storage outlives the call.
    """
    toks_df = (
        spread_for_compute(
            assign_splits(docs.select("doc_id", "text"), "doc_id"), "doc_id"
        )
        .select("doc_id", "split", tokens("text").alias("t"))
        .persist()
    )
    parts = []
    for n in ns:
        grams = toks_df.select(
            "doc_id",
            "split",
            F.explode(
                F.array_distinct(shingles_from_tokens(F.col("t"), n))
            ).alias("gram"),
        ).select("doc_id", "split", F.md5("gram").alias("g"))
        ev = grams.where(F.col("split") == "test").select("g").distinct()
        tr = grams.where(F.col("split") == "train")
        hits = tr.join(ev, "g")
        parts.append(
            hits.agg(
                F.countDistinct("doc_id").cast("long").alias("n_train_docs_flagged"),
                F.countDistinct("g").cast("long").alias("n_leaked_grams"),
            ).select(
                F.lit(n).cast("int").alias("n"),
                "n_train_docs_flagged",
                "n_leaked_grams",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    frame = out.orderBy("n").localCheckpoint()
    toks_df.unpersist()
    return frame


def _decontam_curve_point_sql(n: int) -> str:
    return f"""
  SELECT CAST({n} AS INT) AS n,
         CAST(count(DISTINCT tg.doc_id) AS BIGINT) AS n_train_docs_flagged,
         CAST(count(DISTINCT tg.g) AS BIGINT) AS n_leaked_grams
  FROM (
    SELECT doc_id, md5(u.g) AS g
    FROM (
      SELECT doc_id, bucket,
             list_distinct(list_transform(
               generate_series(1, greatest(len(t) - {n - 1}, 0)),
               i -> array_to_string(t[i:i+{n - 1}], ' '))) AS gs
      FROM toks
    ), unnest(gs) AS u(g)
    WHERE bucket < {_TRAIN_BOUND}
  ) tg
  JOIN (
    SELECT DISTINCT md5(u.g) AS g
    FROM (
      SELECT doc_id, bucket,
             list_distinct(list_transform(
               generate_series(1, greatest(len(t) - {n - 1}, 0)),
               i -> array_to_string(t[i:i+{n - 1}], ' '))) AS gs
      FROM toks
    ), unnest(gs) AS u(g)
    WHERE bucket >= {_VAL_BOUND}
  ) eg USING (g)
""".strip()


def decontam_curve_sql(ns: tuple[int, ...] = DECONTAM_CURVE_NS) -> str:
    points = "\n  UNION ALL\n".join(_decontam_curve_point_sql(n) for n in ns)
    return f"""
WITH assigned AS (
  SELECT doc_id, text,
         CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
           AS bucket
  FROM documents
),
toks AS (
  SELECT doc_id, bucket,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM assigned
)
SELECT * FROM (
{points}
) ORDER BY n
""".strip()


DECONTAM_CURVE_SQL = decontam_curve_sql()


# ---------------------------------------------------------------------------
# Fuzzy decontamination — near-duplicate train↔eval leakage
# ---------------------------------------------------------------------------


def fuzzy_decontam_pairs(docs: DataFrame) -> DataFrame:
    """NEAR-DUPLICATE decontamination (the GPT-3 appendix-C class of
    leak the exact n-gram faces cannot see): train docs whose 3-gram
    shingle-set Jaccard against ANY eval-split doc reaches ≥ 0.5 — a
    paraphrase-length rewrite or a light template edit shares most
    shingles without sharing any single long n-gram run, so
    `decontaminate_documents` (exact gram membership) misses it while
    this face flags it.

    Candidates come from the banded-MinHash join the dedup family
    already runs (`neardup._minhash_band_candidates` — the SCALE path:
    signature rows, never a corpus×eval cross join), restricted to
    pairs straddling train×test; each candidate is then verified with
    an exact intersection over the RAW shingle strings (the audit-face
    discipline — this evidence IS the output, no later stage would
    catch a hash collision).  The candidate stage's measured recall
    curve is `lsh_recall_audit` (≈1.0 at the fixture's band-9 truth,
    ≥ 1−(1−s²)^8 in expectation), published in RECALL.json.

    One row per flagged pair, pure integers: ``(train_id, eval_id,
    n_common, union_sz, jaccard_millionths)`` — the evidence a
    decontamination run attaches to each dropped train doc.  The ≥ 0.5
    line is the exact integer predicate ``2·n_common ≥ union``.

    Scale shape: split labels join the candidate pairs BEFORE the
    verify (only straddling pairs ship their shingle sets), and the
    eval split is ~10% of the corpus, so the verify side is bounded by
    the straddling candidate volume — at 100 TB this face costs the
    standing MinHash signatures plus one small keyed verify join.
    """
    from export_oltp_to_olap_spark.operators.neardup import (
        MINHASH_BAND_R,
        MINHASH_N_HASHES,
        _minhash_band_candidates,
        doc_shingle_sets,
    )

    assigned = assign_splits(docs.select("doc_id"), "doc_id")
    # The compact set frame feeds THREE branches (signatures, both
    # verify sides) — persist it or the corpus re-shingles per branch,
    # then release eagerly like the recall-audit faces (the ADVICE r4 /
    # VERDICT r11 item 5 discipline): localCheckpoint the small flagged
    # pair set, unpersist, return.
    sets = doc_shingle_sets(docs).where(F.size("shs") > 0).persist()
    cands = _minhash_band_candidates(sets, MINHASH_N_HASHES, MINHASH_BAND_R)
    sa = assigned.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = assigned.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    oriented = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            ((F.col("split_a") == "train") & (F.col("split_b") == "test"))
            | ((F.col("split_a") == "test") & (F.col("split_b") == "train"))
        )
        .select(
            F.when(F.col("split_a") == "train", F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("train_id"),
            F.when(F.col("split_a") == "train", F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("eval_id"),
        )
    )
    ta = sets.select(F.col("doc_id").alias("train_id"), F.col("shs").alias("shs_a"))
    tb = sets.select(F.col("doc_id").alias("eval_id"), F.col("shs").alias("shs_b"))
    frame = (
        oriented.join(ta, "train_id")
        .join(tb, "eval_id")
        .withColumn("n_common", F.size(F.array_intersect("shs_a", "shs_b")))
        .withColumn(
            "union_sz", F.size("shs_a") + F.size("shs_b") - F.col("n_common")
        )
        .where(F.col("n_common") * 2 >= F.col("union_sz"))
        .select(
            "train_id",
            "eval_id",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("union_sz").cast("long").alias("union_sz"),
            F.expr(
                "(CAST(n_common AS DECIMAL(38,0)) * 1000000) div union_sz"
            )
            .cast("long")
            .alias("jaccard_millionths"),
        )
        .orderBy("train_id", "eval_id")
        .localCheckpoint()
    )
    sets.unpersist()
    return frame


def _fuzzy_decontam_sql() -> str:
    from export_oltp_to_olap_spark.operators.neardup import MINHASH_BANDS_CTES

    return f"""
WITH {MINHASH_BANDS_CTES},
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
   AND a.doc_id < b.doc_id
),
buck AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
           AS bucket
  FROM documents
),
te AS (
  SELECT CASE WHEN a.bucket < {_TRAIN_BOUND} THEN c.doc_a ELSE c.doc_b END AS train_id,
         CASE WHEN a.bucket < {_TRAIN_BOUND} THEN c.doc_b ELSE c.doc_a END AS eval_id
  FROM candidates c
  JOIN buck a ON a.doc_id = c.doc_a
  JOIN buck b ON b.doc_id = c.doc_b
  WHERE (a.bucket < {_TRAIN_BOUND} AND b.bucket >= {_VAL_BOUND})
     OR (a.bucket >= {_VAL_BOUND} AND b.bucket < {_TRAIN_BOUND})
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
common AS (
  SELECT t.train_id, t.eval_id, count(*) AS c
  FROM te t
  JOIN shingles sa ON sa.doc_id = t.train_id
  JOIN shingles sb ON sb.doc_id = t.eval_id AND sb.sh = sa.sh
  GROUP BY 1, 2
),
ver AS (
  SELECT t.train_id, t.eval_id,
         COALESCE(c.c, 0) AS n_common,
         sa.n + sb.n - COALESCE(c.c, 0) AS union_sz
  FROM te t
  LEFT JOIN common c USING (train_id, eval_id)
  JOIN sizes sa ON sa.doc_id = t.train_id
  JOIN sizes sb ON sb.doc_id = t.eval_id
)
SELECT train_id, eval_id,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(union_sz AS BIGINT) AS union_sz,
       CAST((CAST(n_common AS HUGEINT) * 1000000) // union_sz AS BIGINT)
         AS jaccard_millionths
FROM ver
WHERE 2 * n_common >= union_sz
ORDER BY train_id, eval_id
""".strip()


FUZZY_DECONTAM_SQL = _fuzzy_decontam_sql()


def fuzzy_eval_index(
    eval_docs: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The FROZEN eval-side artifacts the fuzzy at-ingest gate probes:
    ``(band, k0, k1, eval_id)`` MinHash band rows plus ``(eval_id,
    shs_b)`` raw shingle sets — computed once from the benchmark suite
    (eval sets are small and static; persist both as parquet in
    production, the `save_eval_hashes` compute-once convention)."""
    from export_oltp_to_olap_spark.operators.neardup import (
        MINHASH_BAND_R,
        MINHASH_N_HASHES,
        _minhash_bands,
        doc_shingle_sets,
    )

    sets = doc_shingle_sets(eval_docs).where(F.size("shs") > 0)
    bands = _minhash_bands(sets, MINHASH_N_HASHES, MINHASH_BAND_R).select(
        F.col("doc_id").alias("eval_id"), "band", "k0", "k1"
    )
    esets = sets.select(
        F.col("doc_id").alias("eval_id"), F.col("shs").alias("shs_b")
    )
    return bands, esets


def fuzzy_decontam_at_ingest(
    docs: DataFrame, eval_bands: DataFrame, eval_sets: DataFrame
) -> DataFrame:
    """`fuzzy_decontam_pairs` as an INGEST gate: per arriving train doc,
    stateless MinHash band keys (the same column expressions the batch
    and streaming dedup paths share), a STREAM-STATIC inner join against
    the frozen eval band index (append-mode legal; the eval side never
    changes mid-run), and a per-row raw-shingle verify at the same
    integer ≥ 0.5 line.  Works identically on a batch DataFrame (the
    parity test) and a readStream source (the stream ≡ batch test).

    Emission is at-least-once per colliding band (the
    `streaming_minhash_neardup` convention): a pair colliding in two
    bands emits two IDENTICAL rows, so any idempotent sink — or
    ``dropDuplicates`` on the pair key in a downstream batch — restores
    exactly-once; values are deterministic either way.

    Scale shape: eval band index and shingle sets are benchmark-sized
    (tiny next to the ingest volume) — both joins broadcast; per-batch
    cost is one map pass over the arriving docs plus verify work
    proportional to band collisions.
    """
    from export_oltp_to_olap_spark.streaming.neardup_stream import (
        streaming_band_keys,
    )

    keys = streaming_band_keys(docs)
    cand = keys.join(F.broadcast(eval_bands), ["band", "k0", "k1"])
    return (
        cand.join(F.broadcast(eval_sets), "eval_id")
        .withColumn("n_common", F.size(F.array_intersect("shs", "shs_b")))
        .withColumn(
            "union_sz", F.size("shs") + F.size("shs_b") - F.col("n_common")
        )
        .where(F.col("n_common") * 2 >= F.col("union_sz"))
        .select(
            F.col("doc_id").alias("train_id"),
            "eval_id",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("union_sz").cast("long").alias("union_sz"),
            F.expr(
                "(CAST(n_common AS DECIMAL(38,0)) * 1000000) div union_sz"
            )
            .cast("long")
            .alias("jaccard_millionths"),
        )
    )
