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
) -> DataFrame:
    """PQ-ADC top-k with exact rescore: rank the whole corpus by the
    compressed-code distance, shortlist 4k per query, exact-cosine the
    shortlist.  Output matches ``cosine_topk``'s shape.

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
        F.col("prerank") <= 4 * k
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
    n_centroids: int = 16,
    nprobe: int = 4,
    n_queries: int = 10,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
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
    8-byte code each; only the 4k shortlist touches raw vectors.
    """
    from pyspark.sql import Window

    from export_oltp_to_olap_spark.operators.similarity import (
        centroid_table,
        rank_centroids,
    )

    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    ranked = rank_centroids(
        base, centroid_table(base, n_centroids, centroid_mode="kmeans")
    )
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
    books = train_codebooks(residuals, m, ksub)
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
        .where(F.col("prerank") <= 4 * k)
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
