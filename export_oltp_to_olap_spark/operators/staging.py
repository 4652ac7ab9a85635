"""Plan staging: cut a DataFrame's lineage so iterative / multi-branch
consumers don't recompute it.

Three modes, selected per-call or session-wide via the Spark conf
``spark.export_oltp.staging`` (default ``local``):

* ``local`` — ``df.localCheckpoint()``: blocks are cached on the
  executors that computed them.  No DFS write and right for
  single-process runs, but the blocks die with their executor — on a
  real cluster an executor loss makes every downstream job fail with
  "missing checkpoint block".
* ``cache`` — ``df.persist()`` + an eager count: columnar in-memory
  (spilling) batches that KEEP the lineage and therefore the planner's
  statistics — AQE still broadcasts the staged side, and the
  CacheManager serves any later identical plan from the same entry.
  The right mode for FAN-OUT reuse (several consumers of one frame in
  one query); WRONG for iterative folds, where the retained lineage
  grows per iteration — use :func:`stage` (checkpoint family) there.
  See :func:`stage_fanout` for the measured difference.
* ``checkpoint`` — ``df.checkpoint()``: blocks go to the configured
  ``spark.sparkContext.setCheckpointDir`` (HDFS/S3 on a cluster).
  Survives executor loss; costs one distributed write + read.
* ``table`` — write to a named parquet table in the warehouse and read
  it back.  Same durability as ``checkpoint`` plus the artifact is
  inspectable/reusable across sessions (the "staged curated corpus as a
  real table" pattern a production pipeline wants); columnar-compressed,
  so usually smaller than checkpoint block files.

All three return a DataFrame with identical contents and schema — the
choice trades restart-safety and reusability against write cost, never
semantics (tests pin equality across modes).
"""

from __future__ import annotations

import itertools
import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame

STAGING_CONF_KEY = "spark.export_oltp.staging"
_MODES = ("local", "cache", "checkpoint", "table")
_table_counter = itertools.count()


def staging_mode(df: DataFrame) -> str:
    """The session-wide staging mode (conf, defaulting to 'local')."""
    return df.sparkSession.conf.get(STAGING_CONF_KEY, "local")


def stage(
    df: DataFrame,
    mode: str | None = None,
    name: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Materialize ``df`` once and return a lineage-free equivalent.

    ``mode`` overrides the session conf; ``name`` names the table in
    ``table`` mode (auto-generated otherwise).

    ``eager=False`` defers materialization to the CALLER'S FIRST ACTION
    over the returned frame (local/cache/checkpoint modes; ``table`` is
    a write and stays eager).  Iterative loops use this to fold their
    convergence check into the materializing job itself — e.g.
    ``neardup_clusters`` counts changed labels WHILE the round's blocks
    materialize, instead of paying a separate count job per round
    (optimization r15, guide §2.4/§2.6: the action must compute every
    partition of the staged frame for the blocks to be complete — a
    full count/filter-count does; a ``first()``/``limit`` would not).
    """
    mode = mode or staging_mode(df)
    if mode not in _MODES:
        raise ValueError(f"staging mode {mode!r} not one of {_MODES}")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "cache":
        out = df.persist()
        if eager:
            out.count()
        return out
    if mode == "checkpoint":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "staging='checkpoint' needs spark.sparkContext.setCheckpointDir "
                "(point it at DFS/S3 on a cluster)"
            )
        return df.checkpoint(eager=eager)
    return _stage_table(df, name)


def _stage_table(df: DataFrame, name: str | None) -> DataFrame:
    table = name or f"__staged_{next(_table_counter)}"
    spark = df.sparkSession
    # A previous SESSION's table directory may survive in the warehouse
    # while being absent from this session's in-memory catalog;
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS.  Drop both the
    # catalog entry and any stale location first.
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if warehouse:
        stale = os.path.join(warehouse, table.lower())
        if os.path.exists(stale):
            shutil.rmtree(stale)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
    return spark.table(table)


def stage_fanout(df: DataFrame, name: str | None = None) -> DataFrame:
    """Materialize a frame consumed by SEVERAL branches of one query —
    the fan-out form of :func:`stage` for call sites that do NOT need
    lineage cutting (no iterative folding over the result).

    Under the default ``local`` conf this uses ``cache`` instead of
    ``localCheckpoint``, which is the same materialize-once guarantee
    but measurably faster for fan-out consumers: a localCheckpoint
    truncates the plan to an opaque RDD scan, so every downstream stage
    pays a fresh row-oriented read with no statistics, while the cached
    form keeps columnar batches + planner stats and lets the
    CacheManager serve repeated identical plans (sf0.1 curation chain:
    face 5.9 s → 2.5 s cold-per-run, 1.4 s when the session re-runs the
    same face — the r6 "curation family drift" was largely this, eager
    per-run checkpoints accumulating dead blocks).

    Under ``checkpoint``/``table`` conf it defers to :func:`stage`
    unchanged: on a cluster the durable staging patterns (and the
    inspectable staged-table artifact) take precedence over the
    fan-out micro-cost.

    Cache-mode caveats: entries live until ``unpersist()`` or session
    end (bounded — one entry per distinct plan, not per invocation),
    and like any Spark cache they snapshot the source as of first
    materialization.
    """
    if staging_mode(df) == "local":
        return stage(df, mode="cache")
    return stage(df, name=name)
