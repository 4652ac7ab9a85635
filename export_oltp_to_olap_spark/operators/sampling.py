"""Deterministic sampling and dataset splits — training-data plumbing.

A training corpus needs reproducible subsets: eval holdouts, train/val/
test splits, downsampling a 100 TB pool to a target budget.  RNG-based
``df.sample()`` is seed-and-partitioning dependent (resplitting after a
repartition reassigns rows — leakage); hashing the stable row key is
the standard fix: membership is a pure function of the key, so splits
are stable across runs, engines, partitionings, and incremental
appends.  md5 keeps it engine-portable (DuckDB restates it exactly),
and at 64k hash buckets the per-split fractions land within ~1/65536 of
the request.

Scale: a pure map-side projection/filter — no shuffle, no state, safe
to push under any downstream plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.partitioning import spread_for_compute

_BUCKETS = 65536  # 4 md5 hex chars
# stratified_sample folds fraction maps up to this size into a literal
# CASE; larger maps broadcast-join instead of building a deep when-chain.
_CASE_FOLD_MAX = 64


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 65536) from the row key + salt.

    Salting decorrelates different splits/samples taken over the same
    key space (an unsalted 10% sample would always be a subset of the
    unsalted 20% one).
    """
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 4),
        16,
        10,
    ).cast("int")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen purely by hash of ``key_col``."""
    return df.where(_hash_bucket(F.col(key_col), salt) < int(fraction * _BUCKETS))


def assign_splits(
    df: DataFrame,
    key_col: str,
    fractions: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "split",
) -> DataFrame:
    """Append a ``split`` column partitioning rows by hash range.

    Ranges are cumulative over ``fractions`` (rounded to hash buckets);
    every row lands in exactly one split, the last split absorbs the
    rounding tail, and membership never changes when new rows arrive.
    """
    bucket = _hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    for i, (name, frac) in enumerate(fractions):
        acc += frac
        bound = _BUCKETS if i == len(fractions) - 1 else int(acc * _BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def split_summary(documents: DataFrame) -> DataFrame:
    """Per-split row counts and token volume over the documents table —
    the sanity report run after any (re)split of a training corpus."""
    from export_oltp_to_olap_spark.functions.text import tokens

    assigned = assign_splits(documents, "doc_id")
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens("text"))).alias("n_tokens"),
        )
        .orderBy("split")
    )


SPLIT_SUMMARY_SQL = f"""
WITH assigned AS (
  SELECT doc_id, text,
         CASE
           WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                < {int(0.8 * _BUCKETS)} THEN 'train'
           WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                < {int(0.9 * _BUCKETS)} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT split,
       count(*) AS n_docs,
       CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                x -> x <> ''))) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY split
ORDER BY split
"""


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[stratum]``
    of each stratum's rows, chosen purely by hash of ``key_col``.

    The corpus-balancing primitive (e.g. keep 100 % of low-resource
    sources, 10 % of crawl dumps): same hash-membership guarantees as
    `deterministic_sample` — stable under repartition/append, samples
    at different fractions NEST (a row kept at 0.1 is kept at 0.2,
    same salt), so ablation subsets are supersets of each other.
    Strata absent from ``fractions`` fall back to ``default_fraction``.

    Scale: map-side only.  Small fraction maps (≤ ``_CASE_FOLD_MAX``
    strata) fold to a literal CASE expression — zero joins; larger maps
    become a BROADCAST left join against a tiny (stratum, threshold)
    table, so a 10k-source curation config neither builds a 10k-deep
    when-chain nor shuffles the corpus.  Either path leaves the big side
    unshuffled and safe under any downstream plan.
    """
    bucket = _hash_bucket(F.col(key_col), salt)
    default_lit = F.lit(int(default_fraction * _BUCKETS))
    if len(fractions) <= _CASE_FOLD_MAX:
        thresh = None
        for name, frac in sorted(fractions.items()):
            cond = F.col(stratum_col) == name
            lit = F.lit(int(frac * _BUCKETS))
            thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
        thresh = thresh.otherwise(default_lit) if thresh is not None else default_lit
        return df.where(bucket < thresh)
    spark = df.sparkSession
    frac_df = F.broadcast(
        spark.createDataFrame(
            [(name, int(frac * _BUCKETS)) for name, frac in sorted(fractions.items())],
            schema=f"{stratum_col} string, __stratum_thresh int",
        )
    )
    return (
        df.join(frac_df, on=stratum_col, how="left")
        .where(bucket < F.coalesce(F.col("__stratum_thresh"), default_lit))
        .select(*df.columns)  # drop the helper, keep the caller's column order
    )


def stratified_sample_summary(documents: DataFrame) -> DataFrame:
    """Per-source yield of a stratified downsample of the documents
    table (a few sources thinned hard, the rest kept) — the registered,
    oracle-checked face of `stratified_sample`."""
    fractions = {"src0": 0.25, "src1": 0.5, "src2": 0.1}
    kept = stratified_sample(
        documents, "doc_id", "source", fractions, default_fraction=1.0
    )
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH kept AS (
  SELECT source, doc_id
  FROM documents
  WHERE CAST('0x' || substr(md5('stratified:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
        < CASE source
            WHEN 'src0' THEN {int(0.25 * _BUCKETS)}
            WHEN 'src1' THEN {int(0.5 * _BUCKETS)}
            WHEN 'src2' THEN {int(0.1 * _BUCKETS)}
            ELSE {_BUCKETS}
          END
)
SELECT source, count(*) AS n_docs
FROM kept
GROUP BY source
ORDER BY source
"""


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    salt: str = "weighted",
) -> DataFrame:
    """Per-row deterministic Bernoulli sampling with row-specific keep
    probability ``weight_col`` (clamped to [0, 1]).

    The third member of the sampling family (uniform / stratified /
    weighted): keep row iff hash_bucket(key) < weight·65536, so
    membership is a pure function of (key, salt, weight) — stable under
    repartition/append like the others, and monotone in the weight (a
    row kept at weight w stays kept at any w' > w, same salt).  The
    standard quality-weighted corpus downsampling primitive: pass a
    quality score as the weight and the kept set tracks it
    deterministically.  Scale: map-side filter, zero shuffles.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.where(_hash_bucket(F.col(key_col), salt) < w * _BUCKETS)


def weighted_sample_summary(documents: DataFrame) -> DataFrame:
    """Registered face of `weighted_sample`: keep docs with probability
    proportional to a length-based quality proxy; per-source yield."""
    weight = F.least(F.col("n_chars") / F.lit(2000.0), F.lit(1.0))
    kept = weighted_sample(documents, "doc_id", weight)
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


WEIGHTED_SAMPLE_SQL = f"""
SELECT source, count(*) AS n_kept
FROM documents
WHERE CAST('0x' || substr(md5('weighted:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
      < least(n_chars / 2000.0, 1.0) * {_BUCKETS}
GROUP BY source
ORDER BY source
"""


def cap_per_stratum(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen in deterministic
    hash order (a stable without-replacement draw — NOT value order, so
    the kept set is an unbiased subsample rather than a top-k).

    The quota primitive of corpus balancing: cap a dominant crawl dump
    at N docs while small sources pass through whole.  Appends
    ``sample_rank`` (1-based position in the stratum's hash order).
    Membership is reproducible but, unlike the threshold samplers, NOT
    append-stable: new rows hashing earlier can displace the rank-cap
    boundary — use `stratified_sample` when append stability matters
    (documented trade).  Scale: one shuffle on the stratum key; ranks
    never materialize beyond each partition's sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        _hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= cap)
    )


def capped_corpus(documents: DataFrame, cap: int = 20) -> DataFrame:
    """Registered face of `cap_per_stratum` over documents/source."""
    kept = cap_per_stratum(documents, "doc_id", "source", cap)
    return kept.select("source", "doc_id", "sample_rank").orderBy("source", "sample_rank")


def capped_corpus_sql(cap: int = 20) -> str:
    return f"""
WITH ranked AS (
  SELECT source, doc_id,
         CAST(row_number() OVER (
             PARTITION BY source
             ORDER BY CAST('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 4)
                           AS INTEGER),
                      doc_id) AS BIGINT) AS sample_rank
  FROM documents
)
SELECT source, doc_id, sample_rank
FROM ranked
WHERE sample_rank <= {cap}
ORDER BY source, sample_rank
"""


CAPPED_CORPUS_SQL = capped_corpus_sql()


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weighting (α-sampling)
# ---------------------------------------------------------------------------


def mixture_weights(documents: DataFrame, alpha_tenths: int = 5) -> DataFrame:
    """Per-source training-mixture weights: w_s ∝ tokens_s^α.

    The multilingual/multi-source sampling recipe (mBERT, XLM-R §3.1,
    GPT-3's corpus table): raising per-source mass to α < 1 upweights
    small sources so the mixture isn't swamped by the largest crawl.
    ``alpha_tenths`` is α×10 (default α=0.5, the common choice).

    Determinism: tokens_s^α is one IEEE `pow` per source (both engines
    round-to-nearest — identical), then 6-dp rounded and summed in
    DECIMAL, so the normalization denominator is exact and the final
    weights value-hash across engines.  Output also carries the
    effective oversampling factor weight/share (how much α inflates or
    deflates each source vs proportional sampling).

    Scale: one partial-aggregated groupBy(source) over the corpus, then
    arithmetic on S rows (S = #sources ≈ dozens) — the token count is
    the only big-data stage.
    """
    from export_oltp_to_olap_spark.functions.text import token_count

    per_source = (
        spread_for_compute(documents.select("source", "text"), "source")
        .select("source", token_count("text").alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("tokens"))
    )
    # α = 0.5 uses sqrt, which IEEE 754 REQUIRES to be correctly rounded
    # (identical in every engine); pow carries no such guarantee and can
    # drift a ulp between Java and C libm — acceptable for training-mix
    # planning, not for the cross-engine value-hash, so only the sqrt
    # form is oracle-registered.
    t = F.col("tokens").cast("double")
    powed = F.sqrt(t) if alpha_tenths == 5 else F.pow(t, F.lit(alpha_tenths / 10.0))
    scaled = per_source.withColumn("scaled", F.round(powed, 6))
    totals = scaled.agg(
        F.sum(F.col("tokens")).cast("long").alias("tok_total"),
        F.sum(F.col("scaled").cast("decimal(28,10)")).alias("scaled_total"),
    )
    return (
        scaled.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "tokens",
            F.round(F.col("tokens") / F.col("tok_total"), 6).alias("share"),
            F.round(
                F.col("scaled") / F.col("scaled_total").cast("double"), 6
            ).alias("weight"),
            F.round(
                (F.col("scaled") / F.col("scaled_total").cast("double"))
                / (F.col("tokens") / F.col("tok_total")),
                6,
            ).alias("oversample_factor"),
        )
        .orderBy("source")
    )


def mixture_weights_sql(alpha_tenths: int = 5) -> str:
    """DuckDB restatement of `mixture_weights` at the same α."""
    from export_oltp_to_olap_spark.functions.text import SQL_TOKENS

    toks = SQL_TOKENS.format(t="text")
    return f"""
WITH per_source AS (
  SELECT source, CAST(SUM(len({toks})) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
scaled AS (
  SELECT source, tokens,
         round({'sqrt(CAST(tokens AS DOUBLE))' if alpha_tenths == 5
                else f'pow(CAST(tokens AS DOUBLE), {alpha_tenths / 10.0})'}, 6) AS scaled
  FROM per_source
),
totals AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS tok_total,
         SUM(CAST(scaled AS DECIMAL(28,10))) AS scaled_total
  FROM scaled
)
SELECT source, tokens,
       round(tokens / tok_total, 6) AS share,
       round(scaled / CAST(scaled_total AS DOUBLE), 6) AS weight,
       round((scaled / CAST(scaled_total AS DOUBLE)) / (tokens / tok_total), 6)
         AS oversample_factor
FROM scaled, totals
ORDER BY source
"""


MIXTURE_WEIGHTS_SQL = mixture_weights_sql()


def epoch_allocation(
    documents: DataFrame, budget_tenths: int = 15, alpha_tenths: int = 5
) -> DataFrame:
    """Per-source epoch/repeat plan for a token budget under the
    α-mixture — the planning table every pretraining run publishes
    (LLaMA Table 1's "Epochs" column): given ``budget = budget_tenths/10
    × total corpus tokens`` and the `mixture_weights` targets,

    * ``target_tokens``       — the budget share this source must supply,
    * ``repeat_factor``       — whole passes over the source
                                (``target_tokens div tokens``),
    * ``residual_tokens``     — tokens of the final partial pass
                                (``target_tokens % tokens``),
    * ``residual_millionths`` — that partial pass's sampling rate in
                                millionths (exact integer floor-div),
    * ``epochs_millionths``   — ``repeat_factor·10⁶ + residual_millionths``
                                (epochs = this / 10⁶).

    The budget is SCALE-FREE (a multiple of the corpus, not an absolute
    count) so the plan is meaningful at every sf — fixed absolute
    budgets degenerate at 100 TB exactly like fixed share-of-total
    thresholds do.

    ZERO-FLOAT HASH SURFACE — output AND computation (the r11/r12
    two-step fix for the one red driver row): r11 made every published
    column a BIGINT, but still derived ``target_tokens`` through
    ``floor(weight_double × budget)`` — and on the sf0.01 fixture one
    source's product sits 0.017 above its floor boundary, so a
    ≥ 4e-7 cross-build divergence in ``round(double, 6)`` flips one
    floor by a token and the remainder clamp cascades it into a second
    row (rows/schema match, hash fails — exactly what CORRECTNESS_r10
    AND _r11 recorded while local strict equality stayed green).  r12
    adopts the pattern its sibling `capped_epoch_allocation` proved
    green on the same driver build: quantize the weight ONCE to
    ``wu = round(weight·10⁶)`` BIGINT, then compute every decision by
    integer cross-multiplication — ``target0 = (wu · budget) div 10⁶``
    in DECIMAL(38,0) / HUGEINT (no overflow at 100 TB).  Semantics
    shift by < 1 token per source vs the float product, the oracle
    shifts identically, and no float survives anywhere between the
    6-dp ``weight`` contract and the published integers.  Readers
    wanting the 6-dp ``weight`` doubles join `mixture_weights` on
    ``source``.

    Budget-sum EXACTNESS (closes the r8/r9 advisory): per-source
    flooring undershoots by < 1 token each, and the 6-dp weight
    rounding can push Σweights past 1 — so the LARGEST source (token
    count desc, source name as tie-break) absorbs the remainder:
    its target is ``budget − Σ(others)``, making ``Σ target_tokens ==
    budget`` exactly at every scale.  The remainder is < S tokens of
    flooring slack plus ≤ S·5e-7·budget of rounding slack, assigned
    where the relative perturbation is smallest.  The 6-dp weights
    themselves stay as `mixture_weights` publishes them (the
    cross-engine determinism contract).

    Scale: `mixture_weights`' one corpus aggregate, then arithmetic on
    S source rows.
    """
    base = (
        mixture_weights(documents, alpha_tenths)
        .withColumn(
            "budget",
            F.expr(
                f"(CAST({budget_tenths} AS BIGINT) * (SUM(tokens) OVER ())) div 10"
            ),
        )
        .withColumn(
            "wu", F.expr("greatest(CAST(round(weight * 1000000) AS BIGINT), 1)")
        )
        .withColumn(
            "target0",
            F.expr("(CAST(wu AS DECIMAL(38,0)) * budget) div 1000000").cast(
                "long"
            ),
        )
    )
    anchor = (
        F.row_number().over(Window.orderBy(F.col("tokens").desc(), "source")) == 1
    )
    remainder = F.col("budget") - (
        F.sum("target0").over(Window.partitionBy()) - F.col("target0")
    )
    planned = base.withColumn(
        "target_tokens",
        F.when(anchor, remainder).otherwise(F.col("target0")).cast("long"),
    )
    return (
        planned.select(
            "source",
            "tokens",
            "target_tokens",
            F.expr("target_tokens div tokens").alias("repeat_factor"),
            (F.col("target_tokens") % F.col("tokens")).alias("residual_tokens"),
        )
        .withColumn(
            "residual_millionths",
            F.expr(
                "(CAST(residual_tokens AS DECIMAL(38,0)) * 1000000) div tokens"
            ),
        )
        .withColumn(
            "epochs_millionths",
            F.col("repeat_factor") * F.lit(1000000)
            + F.col("residual_millionths"),
        )
        .orderBy("source")
    )


def epoch_allocation_sql(budget_tenths: int = 15, alpha_tenths: int = 5) -> str:
    """DuckDB restatement of `epoch_allocation` at the same knobs,
    including the largest-source remainder clamp (Σ targets ==
    budget exactly).  Integer-only face AND computation (``//``/``%``
    with HUGEINT products over the once-quantized ``wu`` weight) — no
    float reaches any published integer."""
    inner = mixture_weights_sql(alpha_tenths).strip()
    return f"""
WITH mw AS (
{inner}
),
floored AS (
  SELECT source, tokens, weight,
         CAST((CAST({budget_tenths} AS HUGEINT) * (SUM(tokens) OVER ())) // 10
              AS BIGINT) AS budget,
         greatest(CAST(round(weight * 1000000) AS BIGINT), 1) AS wu
  FROM mw
),
targeted AS (
  SELECT source, tokens, budget,
         CAST((CAST(wu AS HUGEINT) * budget) // 1000000 AS BIGINT) AS target0
  FROM floored
),
planned AS (
  -- SUM() OVER promotes to HUGEINT in DuckDB, and HUGEINT reaches
  -- pandas as float64 — the CASE must come back to BIGINT here or the
  -- published target_tokens hashes as `2171.0` against Spark's `2171`
  -- (the green sibling capped_epoch_allocation always had this cast).
  SELECT source, tokens,
         CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY tokens DESC, source) = 1
                   THEN budget - (SUM(target0) OVER () - target0)
                   ELSE target0 END AS BIGINT) AS target_tokens
  FROM targeted
)
SELECT source, tokens, target_tokens,
       CAST(target_tokens // tokens AS BIGINT) AS repeat_factor,
       CAST(target_tokens % tokens AS BIGINT) AS residual_tokens,
       CAST((CAST(target_tokens % tokens AS HUGEINT) * 1000000) // tokens
            AS BIGINT) AS residual_millionths,
       CAST((target_tokens // tokens) * 1000000
            + (CAST(target_tokens % tokens AS HUGEINT) * 1000000) // tokens
            AS BIGINT) AS epochs_millionths
FROM planned
ORDER BY source
""".strip()


EPOCH_ALLOCATION_SQL = epoch_allocation_sql()


# ---------------------------------------------------------------------------
# Training-shard export: deterministic global shuffle + sharding
# ---------------------------------------------------------------------------

N_SHARDS = 8


def shuffle_position(key: Column | str, salt: str = "order") -> Column:
    """Deterministic pseudo-random ORDER key: the full md5 hex of
    (salt, key).  128 bits — collision-free across distinct keys, so
    ordering by it is total and reproducible in any engine.  Training
    corpora must be read in shuffled order; ORDER BY a hash of the key
    is the distributed, restart-stable form of that shuffle (no RNG
    state, no partitioning dependence)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat_ws(":", F.lit(salt), k.cast("string")))


def assign_shards(
    df: DataFrame, key_col: str, n_shards: int = N_SHARDS, salt: str = "shard"
) -> DataFrame:
    """Add ``shard`` ∈ [0, n_shards) and ``pos`` (the within-shard order
    key).  Pure map-side hash of the row key — stable under
    repartitioning and appends, like every split in this module."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return df.withColumn("shard", (h % n_shards).cast("int")).withColumn(
        "pos", shuffle_position(key_col)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = N_SHARDS,
    salt: str = "shard",
) -> None:
    """Export ``df`` as ``n_shards`` shard partitions, each file sorted
    by the shuffle position — a reader streaming shard files in file
    order consumes a deterministic pseudo-random permutation of the
    corpus, and parallel trainers each own a disjoint shard.

    One exchange on ``shard`` (so each shard is one writer), in-file
    sort on ``pos`` — the standard export shape; at 100 TB raise
    ``n_shards`` until shards land near file-size targets (or compose
    with `sources/layout.py::compact_parquet` afterwards).
    """
    assigned = assign_shards(df, key_col, n_shards, salt)
    (
        assigned.repartition(n_shards, "shard")
        # Leading the sort with the partition column satisfies the file
        # writer's required ordering — otherwise it re-sorts by `shard`
        # alone and destroys the position order inside each file.
        .sortWithinPartitions("shard", "pos", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def training_shard_manifest(
    documents: DataFrame, n_shards: int = N_SHARDS
) -> DataFrame:
    """Per-shard manifest of the export: row/char totals plus the first
    and last doc in shuffled order (min_by/max_by over the unique md5
    position — deterministic because positions are collision-free)."""
    s = assign_shards(documents, "doc_id", n_shards)
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min_by("doc_id", "pos").alias("first_doc_id"),
            F.max_by("doc_id", "pos").alias("last_doc_id"),
        )
        .orderBy("shard")
    )


def training_shard_manifest_sql(n_shards: int = N_SHARDS) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, n_chars,
         CAST(CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              % {n_shards} AS INT) AS shard,
         md5('order:' || CAST(doc_id AS VARCHAR)) AS pos
  FROM documents
)
SELECT shard,
       count(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       arg_min(doc_id, pos) AS first_doc_id,
       arg_max(doc_id, pos) AS last_doc_id
FROM s
GROUP BY shard
ORDER BY shard
""".strip()


TRAINING_SHARD_MANIFEST_SQL = training_shard_manifest_sql()


N_QUALITY_BANDS = 10


def curriculum_manifest(
    documents: DataFrame, n_shards: int = N_SHARDS, n_bands: int = N_QUALITY_BANDS
) -> DataFrame:
    """Shard × quality-band balance manifest — the check a curriculum
    or mixture scheduler runs after sharding: hash-sharding promises
    each trainer an unbiased quality profile, and this table is the
    evidence (``(shard, band, n_docs, total_tokens)``; a shard whose
    band histogram deviates signals a broken shard key).

    Bands are FIXED-WIDTH quality intervals (``floor(quality·n)``
    clamped to [0, n)), not ntile deciles: deciles need a global sort
    / global window — a single-partition scale killer — while fixed
    bands are map-side arithmetic on the same bit-identical doubles
    both engines already agree on (`quality_score` ≡
    `QUALITY_EXPR_SQL`, r03-green).  Scale: `assign_shards`' map-side
    hash + per-row band + ONE partial-aggregated groupBy on
    (shard, band) — output is shards × bands rows.
    """
    from export_oltp_to_olap_spark.functions.text import quality_score, token_count

    s = assign_shards(documents, "doc_id", n_shards)
    band = (
        F.least(
            F.greatest(F.floor(quality_score("text") * n_bands), F.lit(0)),
            F.lit(n_bands - 1),
        )
    ).cast("int")
    return (
        s.select("shard", band.alias("band"), token_count("text").alias("_nt"))
        .groupBy("shard", "band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("long").alias("total_tokens"),
        )
        .orderBy("shard", "band")
    )


def curriculum_manifest_sql(
    n_shards: int = N_SHARDS, n_bands: int = N_QUALITY_BANDS
) -> str:
    """DuckDB restatement: the shared quality CTE + the same md5 shard
    hash as `training_shard_manifest_sql`."""
    from export_oltp_to_olap_spark.plans.text_queries import (
        QUALITY_EXPR_SQL,
        quality_feats_cte,
    )

    return f"""
WITH {quality_feats_cte()},
s AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              % {n_shards} AS INT) AS shard,
         CAST(least(greatest(floor(({QUALITY_EXPR_SQL}) * {n_bands}), 0),
              {n_bands - 1}) AS INT) AS band,
         n_tokens
  FROM feats
)
SELECT shard, band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM s
GROUP BY shard, band
ORDER BY shard, band
""".strip()


# ---------------------------------------------------------------------------
# Capped epoch allocation: waterfilling under per-source max-epoch caps
# ---------------------------------------------------------------------------

CAPPED_BUDGET_TENTHS = 30
CAPPED_MAX_EPOCHS_TENTHS = 31


def capped_epoch_allocation(
    documents: DataFrame,
    budget_tenths: int = CAPPED_BUDGET_TENTHS,
    alpha_tenths: int = 5,
    max_epochs_tenths: int = CAPPED_MAX_EPOCHS_TENTHS,
) -> DataFrame:
    """`epoch_allocation` under the REAL-WORLD constraint every
    published mix applies: no source may repeat more than ``max_epochs
    = max_epochs_tenths/10`` times (LLaMA caps Wikipedia/Books around
    2.4 epochs while CommonCrawl runs <1).  Sources whose α-weight
    demands more than their cap saturate at it; the freed budget
    redistributes over the uncapped sources in proportion to their
    weights — the waterfilling optimum, computed in ONE PASS with
    window prefix-sums over the S source rows (no iteration: sorted by
    the cap/weight ratio, the capped set is a prefix, and the boundary
    is the unique p where the implied water level λ_p sits between the
    p-th and p+1-th ratios).

    Output (integer/boolean only — the zero-float-hash discipline):
    ``(source, tokens, cap_tokens, capped, target_tokens,
    epochs_millionths)`` ordered by source, with
    ``Σ target_tokens == min(budget, Σ cap_tokens)`` EXACTLY (flooring
    slack goes to the largest uncapped source — which may exceed its
    cap by < S tokens, the same character as `epoch_allocation`'s
    clamp; when every source is capped the targets are exactly the
    caps and the leftover budget is unallocatable by construction).

    Engine-exactness: weights enter as ``round(weight·10⁶)`` BIGINTs
    (the 6-dp doubles are bit-identical cross-engine, so the integer
    is too); every comparison is a cross-multiplied DECIMAL(38,0) /
    HUGEINT product — no division decides anything.  The sort key is
    the integer proxy ``(cap·10¹²) div weight_millionths`` with source
    as tie-break: a total order both engines compute identically (two
    ratios within 10⁻¹² of each other may order by source rather than
    true ratio — both engines then make the SAME choice, and the
    allocation perturbs by at most a token).

    Scale: `mixture_weights`' one corpus aggregate; everything after is
    windows and joins over S source rows — driver-scale arithmetic,
    like `epoch_allocation`.
    """
    w = Window.orderBy("proxy", "source")
    whole = Window.partitionBy()
    base = (
        mixture_weights(documents, alpha_tenths)
        .select(
            "source",
            "tokens",
            F.expr(
                "greatest(CAST(round(weight * 1000000) AS BIGINT), 1)"
            ).alias("wu"),
            F.expr(
                f"(CAST({max_epochs_tenths} AS BIGINT) * tokens) div 10"
            ).alias("cap"),
        )
        .withColumn(
            "proxy",
            F.expr("(CAST(cap AS DECIMAL(38,0)) * 1000000000000) div wu"),
        )
        .withColumn("budget", F.expr(
            f"(CAST({budget_tenths} AS BIGINT) * (SUM(tokens) OVER ())) div 10"
        ))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("pre_cap", F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("pre_wu", F.sum("wu").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot_cap", F.sum("cap").over(whole))
        .withColumn("tot_wu", F.sum("wu").over(whole))
        .withColumn("n_src", F.count(F.lit(1)).over(whole))
    )
    # Boundary candidates p = 0..S: row rn=k describes boundary p=k-1
    # (prefix-EXCLUSIVE sums; "own" row = lag, "next" row = the row
    # itself); the p=S boundary is the one extra row derived from rn=S.
    from_rows = base.select(
        (F.col("rn") - 1).alias("p"),
        (F.col("budget") - F.col("pre_cap") + F.col("cap")).alias("np"),
        (F.col("tot_wu") - F.col("pre_wu") + F.col("wu")).alias("dp"),
        F.lag("cap").over(w).alias("own_cap"),
        F.lag("wu").over(w).alias("own_wu"),
        F.col("cap").alias("next_cap"),
        F.col("wu").alias("next_wu"),
    )
    last = base.where(F.col("rn") == F.col("n_src")).select(
        F.col("rn").alias("p"),
        (F.col("budget") - F.col("tot_cap")).alias("np"),
        F.lit(0).cast("long").alias("dp"),
        F.col("cap").alias("own_cap"),
        F.col("wu").alias("own_wu"),
        F.lit(None).cast("long").alias("next_cap"),
        F.lit(None).cast("long").alias("next_wu"),
    )
    valid = (
        from_rows.unionByName(last)
        .where(
            F.expr(
                "np >= 0"
                " AND (own_cap IS NULL OR CAST(own_wu AS DECIMAL(38,0)) * np"
                "      >= CAST(own_cap AS DECIMAL(38,0)) * dp)"
                " AND (next_cap IS NULL OR CAST(next_wu AS DECIMAL(38,0)) * np"
                "      < CAST(next_cap AS DECIMAL(38,0)) * dp)"
            )
        )
        .orderBy("p")
        .limit(1)
        .select("p", "np", "dp")
    )
    alloc = (
        base.join(F.broadcast(valid))
        .withColumn("capped", F.col("rn") <= F.col("p"))
        .withColumn(
            "target0",
            F.expr(
                "CASE WHEN capped THEN cap"
                " ELSE (CAST(wu AS DECIMAL(38,0)) * np) div dp END"
            ),
        )
        .withColumn(
            "anchor",
            F.row_number().over(
                Window.orderBy(
                    F.col("capped").cast("int"), F.col("tokens").desc(), "source"
                )
            )
            == 1,
        )
        .withColumn(
            "remainder",
            F.expr("least(budget, tot_cap)") - F.sum("target0").over(whole),
        )
        .withColumn(
            "target_tokens",
            F.expr(
                "CAST(target0 + CASE WHEN anchor AND NOT capped"
                " THEN remainder ELSE 0 END AS BIGINT)"
            ),
        )
    )
    return (
        alloc.select(
            "source",
            "tokens",
            F.col("cap").alias("cap_tokens"),
            "capped",
            "target_tokens",
            F.expr(
                "(CAST(target_tokens AS DECIMAL(38,0)) * 1000000) div tokens"
            ).alias("epochs_millionths"),
        )
        .orderBy("source")
    )


def capped_epoch_allocation_sql(
    budget_tenths: int = CAPPED_BUDGET_TENTHS,
    alpha_tenths: int = 5,
    max_epochs_tenths: int = CAPPED_MAX_EPOCHS_TENTHS,
) -> str:
    """DuckDB restatement of the one-pass waterfilling (HUGEINT
    cross-multiplications; same proxy order, same boundary predicate,
    same anchor clamp)."""
    inner = mixture_weights_sql(alpha_tenths).strip()
    return f"""
WITH mw AS (
{inner}
),
base AS (
  SELECT source, tokens,
         greatest(CAST(round(weight * 1000000) AS BIGINT), 1) AS wu,
         CAST((CAST({max_epochs_tenths} AS HUGEINT) * tokens) // 10 AS BIGINT) AS cap,
         CAST((CAST({budget_tenths} AS HUGEINT) * (SUM(tokens) OVER ())) // 10 AS BIGINT) AS budget
  FROM mw
),
ordered AS (
  SELECT *,
         CAST((CAST(cap AS HUGEINT) * 1000000000000) // wu AS HUGEINT) AS proxy,
         row_number() OVER (ORDER BY (CAST(cap AS HUGEINT) * 1000000000000) // wu, source) AS rn,
         SUM(cap) OVER (ORDER BY (CAST(cap AS HUGEINT) * 1000000000000) // wu, source) AS pre_cap,
         SUM(wu) OVER (ORDER BY (CAST(cap AS HUGEINT) * 1000000000000) // wu, source) AS pre_wu,
         SUM(cap) OVER () AS tot_cap,
         SUM(wu) OVER () AS tot_wu,
         COUNT(*) OVER () AS n_src
  FROM base
),
bounds AS (
  SELECT rn - 1 AS p,
         budget - pre_cap + cap AS np,
         tot_wu - pre_wu + wu AS dp,
         lag(cap) OVER (ORDER BY rn) AS own_cap,
         lag(wu) OVER (ORDER BY rn) AS own_wu,
         cap AS next_cap, wu AS next_wu
  FROM ordered
  UNION ALL
  SELECT rn AS p, budget - tot_cap AS np, 0 AS dp,
         cap AS own_cap, wu AS own_wu, NULL AS next_cap, NULL AS next_wu
  FROM ordered WHERE rn = n_src
),
chosen AS (
  SELECT p, np, dp FROM bounds
  WHERE np >= 0
    AND (own_cap IS NULL OR CAST(own_wu AS HUGEINT) * np >= CAST(own_cap AS HUGEINT) * dp)
    AND (next_cap IS NULL OR CAST(next_wu AS HUGEINT) * np < CAST(next_cap AS HUGEINT) * dp)
  ORDER BY p LIMIT 1
),
alloc AS (
  SELECT o.*, c.p, c.np, c.dp,
         o.rn <= c.p AS capped,
         CASE WHEN o.rn <= c.p THEN CAST(o.cap AS HUGEINT)
              ELSE (CAST(o.wu AS HUGEINT) * c.np) // c.dp END AS target0,
         row_number() OVER (ORDER BY CAST(o.rn <= c.p AS INT),
                            o.tokens DESC, o.source) = 1 AS anchor
  FROM ordered o CROSS JOIN chosen c
),
final AS (
  SELECT *,
         least(budget, tot_cap) - SUM(target0) OVER () AS remainder
  FROM alloc
)
SELECT source, tokens, cap AS cap_tokens, capped,
       CAST(target0 + CASE WHEN anchor AND NOT capped THEN remainder
                           ELSE 0 END AS BIGINT) AS target_tokens,
       CAST((CAST(target0 + CASE WHEN anchor AND NOT capped THEN remainder
                                 ELSE 0 END AS HUGEINT) * 1000000) // tokens
            AS BIGINT) AS epochs_millionths
FROM final
ORDER BY source
""".strip()


CAPPED_EPOCH_ALLOCATION_SQL = capped_epoch_allocation_sql()
