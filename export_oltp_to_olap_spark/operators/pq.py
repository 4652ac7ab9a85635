"""Product-quantization ANN — the memory-scale retrieval path.

Brute force keeps every float; LSH/IVF prune the candidate space but
still score raw vectors.  At 1e9+ vectors the index itself must shrink:
product quantization (Jégou et al., "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011 — the FAISS core) splits each vector
into M subvectors, k-means-quantizes each subspace to 2^b codewords, and
stores only the M code bytes per vector — 64 floats (256 B) → 8 bytes
here, a 32× index compression.  Queries score candidates against the
codebooks (asymmetric distance computation, ADC), then a small exact
rescore fixes the final ranking.

Spark mapping:

* **Train** — one deterministic bounded-sample collect, then M in-driver
  vectorized Lloyd fits over subvector slices (the FAISS convention:
  quantizers train on a sample, never the full corpus); codebooks are a
  tiny (M × ksub × dsub) array broadcast inside closures.
* **Encode** — one Arrow-batched `pandas_udf`: per batch, vectorized
  nearest-codeword argmin per subspace → `codes array<int>`.  The
  encoded table (vec_id, codes) IS the index: M ints per vector,
  partition-parallel, no shuffle.
* **Score (ADC)** — queries broadcast-join the encoded corpus; one
  `pandas_udf` gathers each row's codewords by fancy indexing and
  computes Σ_j ‖q_j − C_j[code_j]‖² fully vectorized.  Approximate
  ranking keeps a 4k shortlist per query; the exact decimal rescore
  (same as cosine_topk) then makes reported scores/order engine-exact.

No SQL oracle (k-means training is iterative, like IVF's kmeans mode):
both operators register as rows-only driver queries; correctness is
pinned by determinism (fixed seed) + a recall floor against the
brute-force baseline + an encode-roundtrip test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.similarity import (
    _exact_dot,
    with_norm,
)

PQ_M = 8  # subspaces
PQ_KSUB = 16  # codewords per subspace
DIM = 64

# Exact-rescore shortlist sizes, as multiples of k.  The shortlist is
# the recall/bandwidth dial: ADC ranking over 8-byte codes is noisy, so
# the rescore must look past the first k code-ranked candidates.  Cost:
# shortlist_mult·k raw vectors per query touch the exact rescore — an
# ABSOLUTE per-query count, independent of corpus size, so at any N it
# stays ≪ the ADC-scanned candidate count and the 100 TB story (codes
# bound bandwidth, rescore bounds error) is intact.
#
# PQ shipped point (round 14 — after the IVF-PQ raise, PQ's 0.44 was
# the next-weakest recall card).  The sf0.1 shortlist sweep, recall@10
# vs the exact brute baseline (in-call-trained codebooks, the card's
# own truth path; full-coverage ceiling = 1.0 since PQ ADC-scans the
# whole corpus):
#
#   mult      4      8     16     32     64
#   recall  0.44   0.55   0.68   0.85   0.98
#
# Shipped: 64k-wide rescore — recall@10 0.98, floored at 0.95 in
# RECALL.json.  The committed card's rescored_fraction (32% at sf0.1)
# is a small-N artifact of the absolute shortlist: 640 raw vectors per
# query is 3×10⁻⁴ of a 2M-vector corpus.
PQ_SHORTLIST_MULT = 64
IVFPQ_SHORTLIST_MULT = 64

IVFPQ_CENTROIDS = 16
# Shipped operating point (VERDICT r13 item 4 — raised from the r7
# 6/16 point, whose 0.68 recall@10 had become the weakest card).  The
# sf0.1 (nprobe × shortlist_mult) grid, recall@10 vs the exact brute
# baseline, full-rescore ceiling in the last column:
#
#   nprobe \ mult    16     32     64    ceiling
#        6          0.68   0.71   0.73   0.73
#        8          0.72   0.77   0.79   0.79
#       10          0.71   0.79   0.82   0.82
#       12          0.75   0.85   0.90   0.91
#
# Every row saturates AT its coverage ceiling: with 16 coarse cells on
# the isotropic fixture, coverage — not code noise — is the binding
# constraint, so recall needs nprobe; the shortlist then buys the rest
# cheaply (the rescore is raw-vector work ≪ the ADC scan at any nprobe).
# Shipped: 12/16 lists probed, 64k-wide exact rescore — recall@10 0.90,
# within 0.01 of its ceiling; RECALL.json commits the grid and a 0.85
# floor.  The exact-rescore contract is unchanged.
IVFPQ_NPROBE = 12


def train_codebooks(
    embeddings: DataFrame, m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = DIM
):
    """Per-subspace k-means codebooks: numpy array (m, ksub, dim//m).

    One deterministic bounded sample collect (`sampled_train_matrix`,
    the FAISS training convention), then M in-driver vectorized Lloyd
    fits over the sample's subvector slices — previously M sequential
    full-corpus `pyspark.ml` fits, which paid (init passes + iters) ×
    M Spark jobs for identical codebook quality.  Deterministic via
    fixed per-subspace seeds.
    """
    import numpy as np

    from export_oltp_to_olap_spark.operators.similarity import (
        lloyd_kmeans,
        sampled_train_matrix,
    )

    dsub = dim // m
    X = sampled_train_matrix(embeddings)  # (n, dim)
    books = [
        lloyd_kmeans(
            np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub]),
            ksub,
            seed=42 + j,
            iters=10,
        )
        for j in range(m)
    ]
    return np.asarray(books, dtype=np.float64)  # (m, ksub, dsub)


def _encode_udf(codebooks):
    """pandas_udf: embedding → array<int> of nearest-codeword ids."""
    from pyspark.sql.functions import pandas_udf

    books = codebooks.tolist()  # ship as plain lists; rebuild ndarray per worker

    @pandas_udf("array<int>")
    def encode(emb):
        import numpy as np
        import pandas as pd

        if len(emb) == 0:
            return pd.Series([], dtype=object)
        C = np.asarray(books)  # (m, ksub, dsub)
        m, ksub, dsub = C.shape
        X = np.vstack(emb.to_numpy()).astype(np.float64, copy=False)  # (n, d)
        Xs = X.reshape(len(X), m, dsub)  # (n, m, dsub)
        # ‖x − c‖² per subspace/codeword: (n, m, ksub)
        d2 = ((Xs[:, :, None, :] - C[None, :, :, :]) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2).astype(np.int32)  # (n, m)
        return pd.Series(list(codes))

    return encode


def pq_encode(embeddings: DataFrame, codebooks) -> DataFrame:
    """(vec_id, codes): the compressed index — M ints per vector."""
    encode = _encode_udf(codebooks)
    return embeddings.where(F.col("embedding").isNotNull()).select(
        "vec_id", encode(F.col("embedding")).alias("codes")
    )


def _adc_udf(codebooks):
    """pandas_udf: (query embedding, codes) → approximate squared L2
    distance Σ_j ‖q_j − C_j[code_j]‖² (vectorized gather, no LUT loop)."""
    from pyspark.sql.functions import pandas_udf

    books = codebooks.tolist()

    @pandas_udf("double")
    def adc(q_emb, codes):
        import numpy as np
        import pandas as pd

        if len(q_emb) == 0:
            return pd.Series([], dtype="float64")
        C = np.asarray(books)  # (m, ksub, dsub)
        m, _, dsub = C.shape
        Q = np.vstack(q_emb.to_numpy()).astype(np.float64, copy=False)
        Qs = Q.reshape(len(Q), m, dsub)
        codes_arr = np.vstack(codes.to_numpy()).astype(np.int64)  # (n, m)
        gathered = C[np.arange(m)[None, :], codes_arr]  # (n, m, dsub)
        return pd.Series(((Qs - gathered) ** 2).sum(axis=(1, 2)))

    return adc


def pq_cosine_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    codebooks=None,
    shortlist_mult: int = PQ_SHORTLIST_MULT,
) -> DataFrame:
    """PQ-ADC top-k with exact rescore: rank the whole corpus by the
    compressed-code distance, shortlist ``shortlist_mult·k`` per query,
    exact-cosine the shortlist.  Output matches ``cosine_topk``'s shape.

    Squared-L2 ADC ranking recalls cosine neighbors imperfectly (norm
    variation + quantization error) — the recall test pins the floor
    against brute force; the rescore makes emitted values/order exact.
    """
    from pyspark.sql import Window

    if codebooks is None:
        codebooks = train_codebooks(embeddings, m, ksub)
    adc = _adc_udf(codebooks)

    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    index = pq_encode(base, codebooks)
    corpus = index.join(base, "vec_id")  # codes + raw vector (rescore needs raw)
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("adc_d2", adc(F.col("q_emb"), F.col("codes")))
    )
    w_pre = Window.partitionBy("query_id").orderBy(F.col("adc_d2").asc(), F.col("vec_id"))
    shortlist = scored.withColumn("prerank", F.row_number().over(w_pre)).where(
        F.col("prerank") <= shortlist_mult * k
    )
    exact = shortlist.withColumn(
        "cos",
        F.round(
            _exact_dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm")),
            6,
        ),
    )
    w_k = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w_k))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + residual product codes (FAISS IVFPQ)
# ---------------------------------------------------------------------------


def _residual(x, c):
    """Element-wise x − c as array<double> (engine-exact widening)."""
    return F.zip_with(x, c, lambda a, b: a.cast("double") - b.cast("double"))


def ivfpq_cosine_topk(
    embeddings: DataFrame,
    n_centroids: int = IVFPQ_CENTROIDS,
    nprobe: int = IVFPQ_NPROBE,
    n_queries: int = 10,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    coarse_centroids=None,
    codebooks=None,
    shortlist_mult: int = IVFPQ_SHORTLIST_MULT,
) -> DataFrame:
    """IVF-PQ top-k: coarse k-means lists bound the candidate set
    (probe ``nprobe`` lists per query), per-vector RESIDUAL product codes
    bound the memory (8 bytes/vector beyond the list id), ADC ranks the
    probed candidates, and the exact decimal rescore fixes the final
    top-k — the standard billion-scale layout (FAISS IVFPQ).

    Residual encoding matters: vectors inside one list share their
    centroid, so codebooks trained on ``x − c(x)`` spend their 16
    codewords per subspace on the intra-list spread instead of the
    corpus-wide spread — tighter quantization for the same bytes.

    Cost per query: nprobe/n_centroids of the corpus scored against an
    8-byte code each; only the ``shortlist_mult·k`` shortlist touches
    raw vectors (64k shipped — residual-code ranking is noisier than
    whole-vector PQ, so recall needs the wider rescore; see the
    shortlist sweep in RECALL.json and the grid above IVFPQ_NPROBE).

    ``coarse_centroids`` / ``codebooks``: pass frozen in-memory arrays
    (e.g. from :func:`load_pq_artifact`) to skip both training jobs —
    the saved-quantizer production path, and what makes the registered
    face SQL-restatable (the quantizers become fixed constants).
    """
    from pyspark.sql import Window

    from export_oltp_to_olap_spark.operators.similarity import (
        centroid_frame,
        centroid_table,
        rank_centroids,
    )

    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    cen = (
        centroid_table(base, n_centroids, centroid_mode="kmeans")
        if coarse_centroids is None
        else centroid_frame(embeddings.sparkSession, coarse_centroids)
    )
    ranked = rank_centroids(base, cen)
    assigned = ranked.where(F.col("cen_rank") == 1).select(
        "vec_id", "embedding", "norm", "cen_id", "cen_emb"
    )

    # Residual codes: codebooks trained on x − c(x), then each vector
    # encoded against them (the stored index = vec_id, cen_id, 8 bytes).
    residuals = assigned.select(
        "vec_id",
        "cen_id",
        _residual(F.col("embedding"), F.col("cen_emb")).alias("embedding"),
    )
    books = train_codebooks(residuals, m, ksub) if codebooks is None else codebooks
    index = pq_encode(residuals, books).join(
        assigned.select("vec_id", "embedding", "norm", "cen_id"), "vec_id"
    )

    probes = ranked.where(
        (F.col("vec_id") < n_queries) & (F.col("cen_rank") <= nprobe)
    ).select(
        F.col("vec_id").alias("query_id"),
        "cen_id",
        _residual(F.col("embedding"), F.col("cen_emb")).alias("q_res"),
    )
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    adc = _adc_udf(books)
    scored = (
        probes.join(index, "cen_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("adc_d2", adc(F.col("q_res"), F.col("codes")))
    )
    w_pre = Window.partitionBy("query_id").orderBy(F.col("adc_d2").asc(), F.col("vec_id"))
    shortlist = (
        scored.withColumn("prerank", F.row_number().over(w_pre))
        .where(F.col("prerank") <= shortlist_mult * k)
        .join(F.broadcast(queries), "query_id")
    )
    exact = shortlist.withColumn(
        "cos",
        F.round(
            _exact_dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm")),
            6,
        ),
    )
    w_k = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w_k))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Committed quantizer artifact: train-once / score-many, SQL-restatable
# ---------------------------------------------------------------------------
#
# The registered driver faces freeze their quantizers to a COMMITTED
# JSON artifact (trained once on the sf0.001 embeddings, seeds fixed),
# exactly like `artifacts/quality_model_fixture.json` froze the quality
# coefficients: the faces then contain zero training jobs, and — because
# a frozen codebook is just a table of constants — the whole ADC
# pipeline restates in ANSI SQL, giving both PQ faces full DuckDB
# oracles (previously permanent rows-only).  The training path above
# stays the API for fresh corpora; rebuild-equivalence of the committed
# artifact is pinned by tests/test_pq_artifact.py.

import os

PQ_ARTIFACT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "pq_codebooks_fixture.json",
)


def train_pq_artifact(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = DIM,
    n_centroids: int = IVFPQ_CENTROIDS,
) -> dict:
    """Train every quantizer the two saved faces need — plain-list dict,
    JSON-serializable: PQ codebooks (corpus-space), IVF-PQ coarse
    centroids (k-means, seed 42 — identical to `_kmeans_centroids`),
    and residual codebooks trained on x − c(x) under those centroids."""
    from export_oltp_to_olap_spark.operators.similarity import (
        centroid_frame,
        lloyd_kmeans,
        rank_centroids,
        sampled_train_matrix,
    )

    books = train_codebooks(embeddings, m, ksub, dim)
    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    X = sampled_train_matrix(base)
    C = lloyd_kmeans(X, n_centroids, seed=42)
    cen = centroid_frame(embeddings.sparkSession, C)
    residuals = (
        rank_centroids(base, cen)
        .where(F.col("cen_rank") == 1)
        .select(
            "vec_id",
            _residual(F.col("embedding"), F.col("cen_emb")).alias("embedding"),
        )
    )
    rbooks = train_codebooks(residuals, m, ksub, dim)
    return {
        "dim": dim,
        "m": m,
        "ksub": ksub,
        "n_centroids": n_centroids,
        "trained_on": "sf0.001 embeddings; lloyd seeds 42+j (books), 42 (coarse)",
        "pq_codebooks": books.tolist(),
        "coarse_centroids": C.tolist(),
        "residual_codebooks": rbooks.tolist(),
    }


def load_pq_artifact(path: str | None = None) -> dict:
    """Read the committed artifact; codebook/centroid fields come back
    as float64 ndarrays (JSON floats round-trip doubles exactly)."""
    import json

    import numpy as np

    with open(path or PQ_ARTIFACT_PATH, encoding="utf-8") as fh:
        art = json.load(fh)
    for key in ("pq_codebooks", "coarse_centroids", "residual_codebooks"):
        art[key] = np.asarray(art[key], dtype=np.float64)
    return art


def pq_cosine_topk_saved(
    embeddings: DataFrame, n_queries: int = 10, k: int = 10, artifact: dict | None = None
) -> DataFrame:
    """Registered face: PQ-ADC top-k against the COMMITTED codebooks —
    no training job; encode + ADC are two Arrow batch sweeps and the
    quantizer is a broadcast-by-closure constant."""
    art = artifact or load_pq_artifact()
    return pq_cosine_topk(
        embeddings, n_queries, k, m=art["m"], ksub=art["ksub"],
        codebooks=art["pq_codebooks"],
    )


def ivfpq_cosine_topk_saved(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    nprobe: int = IVFPQ_NPROBE,
    artifact: dict | None = None,
    shortlist_mult: int = IVFPQ_SHORTLIST_MULT,
) -> DataFrame:
    """Registered face: IVF-PQ top-k against COMMITTED coarse centroids
    + residual codebooks — assignment, encode, probe, ADC, rescore, all
    with zero training jobs."""
    art = artifact or load_pq_artifact()
    return ivfpq_cosine_topk(
        embeddings,
        n_centroids=art["n_centroids"],
        nprobe=nprobe,
        n_queries=n_queries,
        k=k,
        m=art["m"],
        ksub=art["ksub"],
        coarse_centroids=art["coarse_centroids"],
        codebooks=art["residual_codebooks"],
        shortlist_mult=shortlist_mult,
    )


# --- DuckDB oracle restatements (committed-constant quantizers) ------------


def _codeword_values(books) -> str:
    """(j, k, a, w) VALUES rows — a is the ABSOLUTE 1-based dimension
    (j·dsub + i + 1), matching the `elems` CTE's generate_subscripts."""
    import numpy as np

    B = np.asarray(books, dtype=np.float64)
    m, ksub, dsub = B.shape
    return ",\n    ".join(
        f"({j}, {k}, {j * dsub + i + 1}, {B[j, k, i]!r})"
        for j in range(m)
        for k in range(ksub)
        for i in range(dsub)
    )


def _centroid_values(C) -> str:
    """(cen_id, a, w) VALUES rows over absolute 1-based dimension a."""
    import numpy as np

    M = np.asarray(C, dtype=np.float64)
    return ",\n    ".join(
        f"({c}, {a + 1}, {M[c, a]!r})"
        for c in range(M.shape[0])
        for a in range(M.shape[1])
    )


_PQ_TAIL_SQL = """
dots AS (
  SELECT s.query_id, s.vec_id AS neighbor_id,
         CAST(round(SUM(CAST(q.e * d.e AS DECIMAL(38,16))), 12) AS DOUBLE) AS dot
  FROM shortlist s
  JOIN elems q ON q.vec_id = s.query_id
  JOIN elems d ON d.vec_id = s.vec_id AND d.i = q.i
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
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
""".strip()


def pq_cosine_topk_saved_sql(
    artifact: dict | None = None,
    n_queries: int = 10,
    k: int = 10,
    shortlist_mult: int = PQ_SHORTLIST_MULT,
) -> str:
    """Exact DuckDB restatement of :func:`pq_cosine_topk_saved`.

    The committed codebooks inline as a 1024-row VALUES table; encode is
    argmin-by-row_number per (vector, subspace), ADC is a sum of squared
    gaps against the gathered codewords, and the exact decimal rescore
    is the shared `cosine_topk` tail.  Raw-double ADC/encode sums order
    differently across engines (~1e-15); a flip needs two candidates
    that close AND the flipped one inside the true top-k — the same
    measure-zero shortlist-boundary risk the RP/LSH oracles accept,
    and at fixture scale the 64k shortlist covers the whole corpus, so
    the boundary does not even exist there."""
    from export_oltp_to_olap_spark.operators.similarity import _NORMS_CTE

    art = artifact or load_pq_artifact()
    return f"""
WITH {_NORMS_CTE},
cw(j, k, a, w) AS (
  VALUES
    {_codeword_values(art["pq_codebooks"])}
),
codes AS (
  SELECT vec_id, j, k AS code FROM (
    SELECT e.vec_id, c.j, c.k,
           row_number() OVER (PARTITION BY e.vec_id, c.j
                              ORDER BY SUM((e.e - c.w) * (e.e - c.w)) ASC, c.k ASC) AS rn
    FROM elems e JOIN cw c ON e.i = c.a
    GROUP BY e.vec_id, c.j, c.k
  ) WHERE rn = 1
),
gath AS (
  SELECT cd.vec_id, c.a, c.w
  FROM codes cd JOIN cw c ON c.j = cd.j AND c.k = cd.code
),
adc AS (
  SELECT q.vec_id AS query_id, g.vec_id AS vec_id,
         SUM((q.e - g.w) * (q.e - g.w)) AS adc_d2
  FROM elems q
  JOIN gath g ON g.a = q.i AND q.vec_id < {n_queries} AND g.vec_id <> q.vec_id
  GROUP BY 1, 2
),
shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_d2 ASC, vec_id ASC) AS pr
    FROM adc) WHERE pr <= {shortlist_mult * k}
),
{_PQ_TAIL_SQL.format(k=k)}
"""


def ivfpq_cosine_topk_saved_sql(
    artifact: dict | None = None,
    n_queries: int = 10,
    k: int = 10,
    nprobe: int = IVFPQ_NPROBE,
    shortlist_mult: int = IVFPQ_SHORTLIST_MULT,
) -> str:
    """Exact DuckDB restatement of :func:`ivfpq_cosine_topk_saved`:
    frozen-centroid assignment (cosine rank, cen_id tiebreak), exact
    elementwise residuals, residual-codebook encode, probed-list ADC,
    exact decimal rescore.  Same accepted raw-double ordering caveat as
    :func:`pq_cosine_topk_saved_sql`."""
    from export_oltp_to_olap_spark.operators.similarity import _NORMS_CTE

    art = artifact or load_pq_artifact()
    return f"""
WITH {_NORMS_CTE},
cenw(cen_id, a, w) AS (
  VALUES
    {_centroid_values(art["coarse_centroids"])}
),
cen_norms AS (
  SELECT cen_id,
         sqrt(CAST(round(SUM(CAST(w * w AS DECIMAL(38,16))), 12) AS DOUBLE)) AS cen_norm
  FROM cenw GROUP BY cen_id
),
sims AS (
  SELECT e.vec_id, c.cen_id, SUM(e.e * c.w) AS dot
  FROM elems e JOIN cenw c ON e.i = c.a
  GROUP BY 1, 2
),
ranked_cen AS (
  SELECT s.vec_id, s.cen_id,
         row_number() OVER (PARTITION BY s.vec_id
                            ORDER BY s.dot / (n.norm * cn.cen_norm) DESC,
                                     s.cen_id ASC) AS cen_rank
  FROM sims s
  JOIN norms n ON n.vec_id = s.vec_id
  JOIN cen_norms cn ON cn.cen_id = s.cen_id
),
assigned AS (SELECT vec_id, cen_id FROM ranked_cen WHERE cen_rank = 1),
res AS (
  SELECT e.vec_id, e.i, e.e - c.w AS r
  FROM elems e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN cenw c ON c.cen_id = a.cen_id AND c.a = e.i
),
rcw(j, k, a, w) AS (
  VALUES
    {_codeword_values(art["residual_codebooks"])}
),
codes AS (
  SELECT vec_id, j, k AS code FROM (
    SELECT r.vec_id, c.j, c.k,
           row_number() OVER (PARTITION BY r.vec_id, c.j
                              ORDER BY SUM((r.r - c.w) * (r.r - c.w)) ASC, c.k ASC) AS rn
    FROM res r JOIN rcw c ON r.i = c.a
    GROUP BY r.vec_id, c.j, c.k
  ) WHERE rn = 1
),
gath AS (
  SELECT cd.vec_id, c.a, c.w
  FROM codes cd JOIN rcw c ON c.j = cd.j AND c.k = cd.code
),
probes AS (
  SELECT vec_id AS query_id, cen_id
  FROM ranked_cen WHERE vec_id < {n_queries} AND cen_rank <= {nprobe}
),
qres AS (
  SELECT p.query_id, p.cen_id, e.i, e.e - c.w AS r
  FROM probes p
  JOIN elems e ON e.vec_id = p.query_id
  JOIN cenw c ON c.cen_id = p.cen_id AND c.a = e.i
),
adc AS (
  SELECT q.query_id, a.vec_id, SUM((q.r - g.w) * (q.r - g.w)) AS adc_d2
  FROM qres q
  JOIN assigned a ON a.cen_id = q.cen_id AND a.vec_id <> q.query_id
  JOIN gath g ON g.vec_id = a.vec_id AND g.a = q.i
  GROUP BY 1, 2
),
shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_d2 ASC, vec_id ASC) AS pr
    FROM adc) WHERE pr <= {shortlist_mult * k}
),
{_PQ_TAIL_SQL.format(k=k)}
"""
