"""Similarity search over embedding columns (ARRAY<FLOAT>).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant is the scale path (candidates from random-hyperplane buckets,
exact re-scoring on candidates only).

Engine-portable arithmetic: element products are computed in DOUBLE
(float→double widening is exact, one rounding per product in both
engines), accumulated in DECIMAL (order-independent), rounded to scale 12
and cast back to DOUBLE.  The double→decimal element cast itself carries
~1e-13 engine noise (DuckDB scales in double arithmetic, which is lossy
once value×10^16 exceeds 2^53), so the *output* cosine is rounded to 6
decimals and every rank/threshold decision is taken on the rounded value
— noise 7 orders of magnitude below the rounding grain cannot flip a
comparison, and identical rounded keys make window ranks deterministic
via the vec_id tiebreak.

Scale notes (1e9+ vectors):
* brute force is O(Q×N×d) — fine for reranking, wrong for retrieval;
  the plan keeps Q broadcast so N never shuffles.
* hyperplane LSH buckets cut N to E[N/2^P] per probe; the bucket join is
  an equi-join on the bucket id (shuffle on small keys), then exact
  scoring on candidates.  An IVF variant would k-means the corpus and
  probe nearest centroids — same join shape with learned buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.partitioning import spread_for_compute

DOT_DECIMAL = "decimal(38,16)"


def _exact_dot(a: Column, b: Column) -> Column:
    """Exact dot product of two float arrays → DOUBLE (engine-portable)."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DOT_DECIMAL)
    )
    acc = F.aggregate(
        prods,
        F.lit(0).cast(DOT_DECIMAL),
        lambda s, x: (s + x).cast(DOT_DECIMAL),
    )
    return F.round(acc, 12).cast("double")


def _exact_norm(a: Column) -> Column:
    sq = F.transform(
        a, lambda x: (x.cast("double") * x.cast("double")).cast(DOT_DECIMAL)
    )
    acc = F.aggregate(
        sq, F.lit(0).cast(DOT_DECIMAL), lambda s, x: (s + x).cast(DOT_DECIMAL)
    )
    return F.sqrt(F.round(acc, 12).cast("double"))


def _fast_dot(a: Column, b: Column) -> Column:
    """Plain double-sum dot product — the cheap PRESCORE.

    Within ~1e-13 relative of the exact decimal dot for unit-scale
    embeddings; used only to cut the pair space before exact rescoring,
    with a margin far wider than that noise, so it can never change the
    final answer.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


# Prescore margin: decimal-vs-double divergence is ≤ ~1e-13; 1e-6 leaves
# seven orders of magnitude of slack.
PRESCORE_MARGIN = 1e-6


def with_norm(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append the L2 norm — spread first: every similarity plan layers its
    per-row arithmetic (norms, band keys, pair dots) directly above this
    node, and a single-file input would pin all of it to one core."""
    return spread_for_compute(embeddings, "vec_id").withColumn(
        "norm", _exact_norm(F.col(vec_col))
    )


def cosine_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors
    (by vec_id), self excluded.  Output: (query_id, neighbor_id, cos, rank).
    """
    from pyspark.sql import Window

    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    pairs = base.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    # Two-phase top-k: rank every pair by the cheap double prescore, keep
    # a 2k shortlist per query, exact-rescore only the shortlist.  A true
    # top-k member can miss the 2k cut only if ≥ k shortlist scores sit
    # within double-noise (~1e-13) of it — not a property of real
    # embedding data; the exact rescore then makes order and values exact.
    pre = pairs.withColumn(
        "cos_pre",
        _fast_dot(F.col("q_emb"), F.col("embedding"))
        / (F.col("q_norm") * F.col("norm")),
    )
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("cos_pre").desc(), F.col("vec_id")
    )
    shortlist = pre.withColumn("prerank", F.row_number().over(w_pre)).where(
        F.col("prerank") <= 2 * k
    )
    scored = shortlist.withColumn(
        "cos",
        F.round(
            _exact_dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


_NORMS_CTE = """
elems AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (
  SELECT vec_id,
         sqrt(CAST(round(SUM(CAST(e * e AS DECIMAL(38,16))), 12) AS DOUBLE)) AS norm
  FROM elems GROUP BY vec_id
)
""".strip()

COSINE_TOPK_SQL = f"""
WITH {_NORMS_CTE},
dots AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         CAST(round(SUM(CAST(q.e * d.e AS DECIMAL(38,16))), 12) AS DOUBLE) AS dot
  FROM elems q JOIN elems d ON q.i = d.i AND q.vec_id < 10 AND d.vec_id <> q.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         round(dot / (nq.norm * nd.norm), 6) AS cos
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nd ON nd.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 10
"""


def cosine_neardup(embeddings: DataFrame, threshold: float = 0.4) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup).

    Brute-force all-pairs at fixture scale; the threshold cut is exact
    (see module docstring), so this is oracle-checkable.
    """
    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    # Two-phase scoring: every pair pays only the cheap double dot; the
    # exact-decimal dot (interpreted, ~10× dearer) reruns only for pairs
    # already within PRESCORE_MARGIN of the threshold.  Same final answer
    # (margin ≫ double noise), ~N²→survivors cost for the exact path.
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos_pre",
            _fast_dot(F.col("emb_a"), F.col("emb_b"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .where(F.col("cos_pre") >= F.lit(threshold - PRESCORE_MARGIN))
        .withColumn(
            "cos",
            F.round(
                _exact_dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("norm_a") * F.col("norm_b")),
                6,
            ),
        )
        .where(F.col("cos") >= F.lit(threshold))
        .select("vec_a", "vec_b", "cos")
    )


COSINE_NEARDUP_SQL = f"""
WITH {_NORMS_CTE},
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(round(SUM(CAST(a.e * b.e AS DECIMAL(38,16))), 12) AS DOUBLE) AS dot
  FROM elems a JOIN elems b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT vec_a, vec_b, round(dot / (na.norm * nb.norm), 6) AS cos
FROM dots
JOIN norms na ON na.vec_id = vec_a
JOIN norms nb ON nb.vec_id = vec_b
WHERE round(dot / (na.norm * nb.norm), 6) >= 0.4
"""

# ---------------------------------------------------------------------------
# Hyperplane-LSH bucketed ANN (the scale path)
# ---------------------------------------------------------------------------
#
# Banded OR-construction: L independent bands of b hyperplanes each; two
# vectors are candidates if they agree on ALL b sign bits of ANY band.
# P(candidate | angle θ) = 1 − (1 − (1−θ/π)^b)^L — at (L=4, b=2) recall is
# ≈0.85 for cos 0.35 and rises with similarity, while candidate volume
# stays ≈L/2^b of the full pair space.  At corpus scale, raise b to shrink
# buckets and L to recover recall (cost ∝ L × Σ bucket²).

N_BANDS = 4
PLANES_PER_BAND = 2
DIM = 64


def _hyperplanes(n_planes: int, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 (no RNG → reproducible and
    restatable inside the SQL oracle)."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


def _band_key(vec: Column, planes: list[list[int]], band: int, b: int) -> Column:
    """Band bucket id: sign-bit string of this band's hyperplane dots.

    Signs come from exact decimal sums, so bucket assignment is
    deterministic and engine-identical even for near-zero projections.
    """
    bits = []
    for row in planes[band * b : (band + 1) * b]:
        plane = F.array(*[F.lit(float(v)) for v in row])
        # Sign from the plain double projection.  Cross-engine double
        # summation differs by ~1e-13 ulps, so a sign flip needs a
        # projection within 1e-13 of zero — vanishingly unlikely and
        # self-healing (the exact rescore keeps precision exact either
        # way); paying a decimal-exact dot per plane per row for it
        # doubled the operator's runtime.
        bits.append(F.when(_fast_dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_cosine_neardup(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_bands: int = N_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
) -> DataFrame:
    """Banded-LSH near-dup: candidates agree on any band's bucket; exact
    cosine re-scores candidates only.  Recall < 1 by construction — the
    oracle restates the same pipeline, and tests measure recall against
    ``cosine_neardup``."""
    planes = _hyperplanes(n_bands * planes_per_band)
    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    # All band keys in ONE projection + stack (not a union of per-band
    # branches): a union re-reads and re-projects the source once per
    # band per join side — 2·L scans and exchanges where one suffices.
    key_cols = [
        _band_key(F.col("embedding"), planes, band, planes_per_band).alias(f"bk{band}")
        for band in range(n_bands)
    ]
    stack_args = ", ".join(f"{band}, bk{band}" for band in range(n_bands))
    bucketed = base.select("vec_id", *key_cols).select(
        "vec_id", F.expr(f"stack({n_bands}, {stack_args}) AS (band, bucket)")
    )

    # Candidates carry ONLY the id pair: the bucket self-join fans out to
    # ~Σ bucket² rows, and dragging two 64-float arrays through that join
    # and its distinct() made the shuffle ~100× wider than needed.  Ids
    # dedup cheaply; the embeddings re-attach afterwards via two joins to
    # the compact base (broadcast under AQE — corpus-sized, not
    # candidate-sized).
    a = bucketed.select(F.col("vec_id").alias("vec_a"), "band", "bucket")
    b = bucketed.select(F.col("vec_id").alias("vec_b"), "band", "bucket")
    candidates = (
        a.join(b, on=["band", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    eb = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    # Two-phase scoring (as in cosine_neardup): every candidate pays the
    # cheap double dot; the exact decimal dot reruns only within the
    # margin, so the final answer is identical and the interpreted
    # decimal path runs on survivors, not the whole candidate set.
    return (
        candidates.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn(
            "cos_pre",
            _fast_dot(F.col("emb_a"), F.col("emb_b"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .where(F.col("cos_pre") >= F.lit(threshold - PRESCORE_MARGIN))
        .withColumn(
            "cos",
            F.round(
                _exact_dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("norm_a") * F.col("norm_b")),
                6,
            ),
        )
        .where(F.col("cos") >= F.lit(threshold))
        .select("vec_a", "vec_b", "cos")
    )


def _planes_sql_values(planes: list[list[int]]) -> str:
    rows = []
    for j, row in enumerate(planes):
        for i, v in enumerate(row):
            rows.append(f"({j},{i + 1},{v}.0)")
    return ", ".join(rows)


def lsh_cosine_neardup_sql(
    threshold: float = 0.35,
    n_bands: int = N_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
) -> str:
    planes = _hyperplanes(n_bands * planes_per_band)
    return f"""
WITH {_NORMS_CTE},
planes(j, i, w) AS (VALUES {_planes_sql_values(planes)}),
proj AS (
  SELECT e.vec_id, p.j, SUM(e.e * p.w) AS d
  FROM elems e JOIN planes p ON e.i = p.i
  GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id, j // {planes_per_band} AS band,
         string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
  FROM proj GROUP BY vec_id, j // {planes_per_band}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
               AND a.vec_id < b.vec_id
),
dots AS (
  SELECT c.vec_a, c.vec_b,
         CAST(round(SUM(CAST(ea.e * eb.e AS DECIMAL(38,16))), 12) AS DOUBLE) AS dot
  FROM cand c
  JOIN elems ea ON ea.vec_id = c.vec_a
  JOIN elems eb ON eb.vec_id = c.vec_b AND eb.i = ea.i
  GROUP BY 1, 2
)
SELECT vec_a, vec_b, round(dot / (na.norm * nb.norm), 6) AS cos
FROM dots
JOIN norms na ON na.vec_id = vec_a
JOIN norms nb ON nb.vec_id = vec_b
WHERE round(dot / (na.norm * nb.norm), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — learned buckets, the retrieval-scale path
# ---------------------------------------------------------------------------
#
# Corpus vectors are assigned to their nearest centroid (the inverted
# lists); a query probes only its `nprobe` nearest centroids and scores
# the vectors in those lists: cost Q × (C + N·nprobe/C) instead of Q × N.
# Centroids here are the first `n_centroids` corpus vectors — a
# deterministic stand-in for k-means so the DuckDB oracle can restate
# training exactly; production swaps in `pyspark.ml.clustering.KMeans`
# centroids with the identical assignment/probe plan (same join shape,
# learned buckets — SCALE.md).
#
# Nearest-centroid argmax uses RAW double cosines (no rounding): a
# cross-engine flip needs two centroid similarities within ~1e-13 —
# negligible, and deliberately NOT rounded because rounding would
# manufacture exact ties at the grain.  Final neighbor scores use the
# exact decimal dot, so reported values and ranks are engine-exact.

IVF_CENTROIDS = 16
IVF_NPROBE = 4


def _centroid_rank_window():
    from pyspark.sql import Window

    return Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cen_id"))


def ivf_cosine_topk(
    embeddings: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    n_queries: int = 10,
    k: int = 10,
) -> DataFrame:
    """IVF top-k: probe ``nprobe`` nearest centroid lists per query, exact
    cosine over probed candidates only.  Recall < 1 by construction (a
    true neighbor can live in an unprobed list) — measured against the
    brute-force baseline in tests; the oracle restates this exact
    pipeline so the check is deterministic."""
    from pyspark.sql import Window

    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    centroids = base.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cen_id"),
        F.col("embedding").alias("cen_emb"),
        F.col("norm").alias("cen_norm"),
    )
    sims = base.crossJoin(F.broadcast(centroids)).withColumn(
        "sim",
        _fast_dot(F.col("embedding"), F.col("cen_emb"))
        / (F.col("norm") * F.col("cen_norm")),
    )
    w_cen = _centroid_rank_window()
    ranked = sims.withColumn("cen_rank", F.row_number().over(w_cen))
    # inverted lists: every vector lives in exactly its nearest list
    assigned = ranked.where(F.col("cen_rank") == 1).select(
        "vec_id", "embedding", "norm", "cen_id"
    )
    # each query probes its nprobe nearest lists
    probes = (
        ranked.where((F.col("vec_id") < n_queries) & (F.col("cen_rank") <= nprobe))
        .select(F.col("vec_id").alias("query_id"), "cen_id")
    )
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        probes.join(assigned, "cen_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(queries), "query_id")
        .withColumn(
            "cos",
            F.round(
                _exact_dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_norm") * F.col("norm")),
                6,
            ),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_k))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_cosine_topk_sql(
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    n_queries: int = 10,
    k: int = 10,
) -> str:
    return f"""
WITH {_NORMS_CTE},
cen_sims AS (
  SELECT v.vec_id, c.vec_id AS cen_id,
         SUM(v.e * c.e) / (nv.norm * nc.norm) AS sim
  FROM elems v
  JOIN elems c ON c.i = v.i AND c.vec_id < {n_centroids}
  JOIN norms nv ON nv.vec_id = v.vec_id
  JOIN norms nc ON nc.vec_id = c.vec_id
  GROUP BY v.vec_id, c.vec_id, nv.norm, nc.norm
),
ranked AS (
  SELECT vec_id, cen_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cen_id) AS cen_rank
  FROM cen_sims
),
assigned AS (SELECT vec_id, cen_id FROM ranked WHERE cen_rank = 1),
probes AS (
  SELECT vec_id AS query_id, cen_id FROM ranked
  WHERE vec_id < {n_queries} AND cen_rank <= {nprobe}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assigned a ON a.cen_id = p.cen_id
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(CAST(round(SUM(CAST(eq.e * en.e AS DECIMAL(38,16))), 12) AS DOUBLE)
               / (nq.norm * nn.norm), 6) AS cos
  FROM cand c
  JOIN elems eq ON eq.vec_id = c.query_id
  JOIN elems en ON en.vec_id = c.neighbor_id AND en.i = eq.i
  JOIN norms nq ON nq.vec_id = c.query_id
  JOIN norms nn ON nn.vec_id = c.neighbor_id
  GROUP BY c.query_id, c.neighbor_id, nq.norm, nn.norm
),
topk AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM topk WHERE rank <= {k}
"""
