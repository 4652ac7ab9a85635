"""Persisted IVF index: build once, probe cheaply, append deltas.

`similarity.ivf_cosine_topk` recomputes centroids and assignments on
every call — right for a one-shot query, wrong for the production ANN
serving/eval loop where the corpus is indexed ONCE and then probed by
many small query batches while new vectors trickle in.  This module is
the persisted form, the ANN analogue of the persisted band index in
`neardup.minhash_lsh_neardup_delta`:

* ``build_ivf_index`` — train/choose centroids (`similarity.centroid_
  table` conventions: "first" = oracle-restatable, "kmeans" = learned),
  assign every vector to its nearest list, and write two parquet
  tables: ``centroids`` (C rows) and ``postings`` PARTITIONED BY
  ``cen_id``.  The partitioning is the point: each inverted list is its
  own partition directory, so a probe reads ONLY the probed lists —
  partition pruning at the file-listing level, before any row is
  scanned (`PartitionFilters` in the scan, asserted in tests).

* ``probe_ivf_index`` — route a bounded query batch: rank centroids per
  query (broadcast of C rows), COLLECT the (query, list) routing table
  (≤ n_queries × nprobe rows — the query batch is small by definition;
  guarded), filter postings with the LITERAL probed-list set (static
  partition pruning — no job needed to prune), then the same two-phase
  prescore/exact-rescore as `ivf_cosine_topk`.

* ``append_ivf_index`` — assign NEW vectors against the FROZEN
  centroids and append to the postings table (per-list parquet
  appends; no rewrite of existing lists, no retraining).  Lists drift
  from optimal as the distribution shifts — the standard IVF trade;
  rebuild cadence is an ops decision, the probe path is oblivious.

Scale (100 TB): build is one broadcast-assignment pass + one
partitioned write; append touches only the partitions its delta lands
in; probes read nprobe/C of the corpus (file-pruned) regardless of
corpus size.  Nothing shuffles on the corpus side except the
partitioned write itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators.similarity import (
    IVF_CENTROIDS,
    IVF_NPROBE,
    _exact_dot,
    _pair_dot_udf,
    centroid_table,
    rank_centroids,
    with_norm,
)

MAX_ROUTING_ROWS = 65_536  # collect guard: n_queries × nprobe must stay bounded


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = IVF_CENTROIDS,
    centroid_mode: str = "first",
) -> None:
    """Write ``{path}/centroids`` and ``{path}/postings`` (partitioned by
    ``cen_id``) for ``embeddings`` (vec_id, embedding)."""
    base = with_norm(embeddings).select("vec_id", "embedding", "norm")
    cen = centroid_table(base, n_centroids, centroid_mode)
    cen.write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = (
        rank_centroids(base, cen)
        .where(F.col("cen_rank") == 1)
        .select("cen_id", "vec_id", "embedding", "norm")
    )
    (
        assigned.repartition("cen_id")  # one writer per list — no file spray
        .write.mode("overwrite")
        .partitionBy("cen_id")
        .parquet(f"{path}/postings")
    )


def append_ivf_index(new_embeddings: DataFrame, path: str) -> None:
    """Assign a delta batch against the frozen centroids and append to
    the postings table — existing lists are never rewritten.

    Element-type contract: the postings table's schema is the index's
    schema.  A producer whose feed declares `array<double>` against a
    float-built index (or vice versa) must NOT be written verbatim —
    parquet part files with mixed element types corrupt the directory
    (which footer the reader samples decides whether probes work).  We
    read the stored postings schema once and cast every appended column
    to it before the write.
    """
    spark = new_embeddings.sparkSession
    cen = spark.read.parquet(f"{path}/centroids")
    stored = {f.name: f.dataType for f in spark.read.parquet(f"{path}/postings").schema}
    delta = new_embeddings.withColumn(
        "embedding", F.col("embedding").cast(stored["embedding"])
    )
    base = with_norm(delta).select("vec_id", "embedding", "norm")
    assigned = (
        rank_centroids(base, cen)
        .where(F.col("cen_rank") == 1)
        .select(
            F.col("cen_id").cast(stored["cen_id"]).alias("cen_id"),
            F.col("vec_id").cast(stored["vec_id"]).alias("vec_id"),
            "embedding",
            F.col("norm").cast(stored["norm"]).alias("norm"),
        )
    )
    (
        assigned.repartition("cen_id")
        .write.mode("append")
        .partitionBy("cen_id")
        .parquet(f"{path}/postings")
    )


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = IVF_NPROBE,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` neighbors per query row (query_id, embedding) from a
    persisted index — output matches `ivf_cosine_topk`'s convention:
    (query_id, neighbor_id, cos, rank).

    Self-matches (a query whose vec_id exists in the index) are
    excluded by id, as in the one-shot operator.
    """
    from pyspark.sql import Window

    pair_dot = _pair_dot_udf()
    cen = spark.read.parquet(f"{path}/centroids")
    q = with_norm(queries.withColumnRenamed("query_id", "vec_id")).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    routing = (
        rank_centroids(
            q.select(
                F.col("query_id").alias("vec_id"),
                F.col("q_emb").alias("embedding"),
                F.col("q_norm").alias("norm"),
            ),
            cen,
        )
        .where(F.col("cen_rank") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), "cen_id")
        .limit(MAX_ROUTING_ROWS + 1)
        .collect()
    )
    if len(routing) > MAX_ROUTING_ROWS:
        raise ValueError(
            f"probe routing table exceeds {MAX_ROUTING_ROWS} rows — split the "
            f"query batch; probing is a bounded-batch path by design"
        )
    probed_lists = sorted({r["cen_id"] for r in routing})
    pairs = spark.createDataFrame(
        [(r["query_id"], r["cen_id"]) for r in routing], "query_id long, cen_id bigint"
    )
    # Literal IN-list on the partition column → static partition pruning:
    # only the probed list directories are even listed.
    postings = spark.read.parquet(f"{path}/postings").where(
        F.col("cen_id").isin(probed_lists)
    )
    pre = (
        postings.join(F.broadcast(pairs), "cen_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cos_pre",
            pair_dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm")),
        )
    )
    w_pre = Window.partitionBy("query_id").orderBy(F.col("cos_pre").desc(), F.col("vec_id"))
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


def retract_ivf_index(deleted_ids: DataFrame, path: str) -> None:
    """Delete vectors from a persisted index — partition-scoped
    copy-on-write: only the posting LISTS containing a deleted vector
    are rewritten (dynamic partition overwrite), every other list's
    files are untouched, and a list whose last member dies has its
    directory removed outright.  The "clusters touching the delete"
    discipline applied to the ANN index.

    Centroids stay frozen, exactly as `append_ivf_index` declares:
    assignment is per-vector against the frozen centroid frame, so the
    retracted index is bit-identical to a fresh build over the
    survivors with the same centroids (pinned in
    tests/test_ann_index.py), and centroid drift remains the rebuild-
    cadence ops decision.  Cost: O(postings of affected lists) read +
    rewrite; bounded by the delete batch's list fan-out.
    """
    spark = deleted_ids.sparkSession
    postings = spark.read.parquet(f"{path}/postings")
    d = deleted_ids.select("vec_id").distinct()
    affected = postings.join(d, "vec_id").select("cen_id").distinct()
    survivors = (
        postings.join(F.broadcast(affected), "cen_id")
        .join(d, "vec_id", "left_anti")
        .select("vec_id", "embedding", "norm", "cen_id")
    )
    # Materialize the survivors BEFORE the overwrite: the plan lazily
    # reads the same path it is about to rewrite, which is safe only
    # because dynamic partition overwrite stages its output and commits
    # after all input is consumed — an assumption a writer/API change
    # could silently break into self-truncation (ADVICE r13).  The
    # localCheckpoint severs that read-then-overwrite coupling outright;
    # it is bounded by the affected lists' postings, i.e. the delete
    # batch's list fan-out, never the index.
    survivors = survivors.localCheckpoint(eager=True)
    emptied = [
        r["cen_id"]
        for r in affected.join(
            survivors.select("cen_id").distinct(), "cen_id", "left_anti"
        ).collect()
    ]
    conf = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(conf, "static")
    spark.conf.set(conf, "dynamic")
    try:
        (
            survivors.repartition("cen_id")
            .write.mode("overwrite")
            .partitionBy("cen_id")
            .parquet(f"{path}/postings")
        )
    finally:
        spark.conf.set(conf, old)
    # Dynamic overwrite cannot erase a partition it writes no rows to —
    # fully-emptied lists are removed explicitly (bounded by |delete|).
    # Deletion goes through the Hadoop FileSystem API so the index path
    # may live on any supported scheme (hdfs://, s3a://, file:// —
    # ADVICE r13: os.path/shutil silently no-op'd on non-local stores,
    # leaving deleted vectors probe-visible in the emptied lists).
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for cid in emptied:
        part = jvm.org.apache.hadoop.fs.Path(f"{path}/postings/cen_id={cid}")
        fs = part.getFileSystem(hconf)
        if fs.exists(part):
            fs.delete(part, True)
