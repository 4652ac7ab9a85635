"""Data layout for scan pruning: sorted and Z-ordered parquet writes.

Predicate pushdown only pays off if the FILES are laid out so row-group
min/max statistics actually exclude data.  A 100 TB table written in
arrival order has every row group spanning the whole key range — the
scan "pushes" the filter and then reads everything anyway.  Two layout
writers fix that at write time (the lakehouse OPTIMIZE/ZORDER step,
dependency-free):

* ``write_sorted_parquet`` — global range partitioning + in-file sort on
  the query columns.  Row groups become non-overlapping key ranges, so a
  point/range predicate on the leading column prunes all but O(matching)
  row groups.  Right when one column dominates the workload (event time).
* ``write_zorder_parquet`` — interleave the bits of several bucketized
  columns into one Z-value and range-sort by it.  Each file then covers
  a small HYPER-RECTANGLE of the combined key space, so predicates on
  ANY of the columns prune — the multi-dimensional trade: each single
  column's per-file span is wider than a dedicated sort would give, but
  no column degenerates to full-range files the way trailing sort keys
  do.

Both are plain ``DataFrameWriter`` output: the reading side needs no
cooperation beyond the default parquet filter pushdown, and the same
files serve DuckDB/Trino/anything that reads parquet statistics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # bits per dimension; 2 dims → 32-bit Z-values


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    order_cols: Sequence[str],
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet range-partitioned and sorted on
    ``order_cols`` — non-overlapping per-file key ranges for min/max
    pruning.  ``n_files`` bounds output file count (defaults to the
    session shuffle parallelism; at 100 TB size it so files land near
    the 128 MB-1 GB sweet spot)."""
    cols = [F.col(c) for c in order_cols]
    part = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


DEPTH_BITS_MAX = 8  # equi-depth folds 2^bits-1 boundaries into an expression


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = ZORDER_BITS, mode: str = "width"
) -> Column:
    """Z-order (Morton) key over ``cols``: bucketize each column to
    ``bits`` bits, then interleave the bits.  Column expressions only —
    the bounds/boundaries are the one small driver-side action.

    ``mode="width"`` (default): equi-width cells between observed
    min/max (``width_bucket``) — needs only two scalars per column;
    skew costs pruning efficiency, never correctness.

    ``mode="depth"``: equi-depth cells from ``approxQuantile``
    boundaries — the Delta/Iceberg OPTIMIZE ZORDER convention (range
    ids).  Every cell holds ~equal rows regardless of skew, so file
    spans stay narrow on skewed columns too.  The 2^bits − 1 boundaries
    fold into a per-row HOF count over a broadcast literal array
    (vectorized, no UDF); ``bits`` is capped at ``DEPTH_BITS_MAX`` to
    bound the expression (256 cells per dimension prune plenty — the
    interleaved key still has bits × len(cols) bits of resolution).
    """
    n_buckets = 1 << bits
    parts: list[Column] = []
    if mode == "depth":
        if bits > DEPTH_BITS_MAX:
            raise ValueError(
                f"depth mode caps bits at {DEPTH_BITS_MAX} (got {bits}): "
                f"boundaries fold into a literal expression"
            )
        probs = [i / n_buckets for i in range(1, n_buckets)]
        for c in cols:
            cuts = df.select(F.col(c).cast("double").alias(c)).approxQuantile(
                c, probs, 0.001
            )
            bounds_arr = F.array(*[F.lit(float(x)) for x in cuts])
            b = F.aggregate(
                bounds_arr,
                F.lit(0).cast("long"),
                lambda acc, cut: acc
                + F.when(F.col(c).cast("double") >= cut, 1).otherwise(0),
            )
            parts.append(F.least(b, F.lit(n_buckets - 1)).cast("long"))
    elif mode == "width":
        bounds = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
        ).first()
        for c in cols:
            lo, hi = float(bounds[f"min_{c}"]), float(bounds[f"max_{c}"])
            if hi <= lo:
                hi = lo + 1.0
            # width_bucket returns 1..n+1; clamp into [0, n_buckets).
            b = F.width_bucket(
                F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets)
            )
            parts.append(
                F.least(F.greatest(b - 1, F.lit(0)), F.lit(n_buckets - 1)).cast("long")
            )
    else:
        raise ValueError(f"unknown zorder mode: {mode!r}")
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for d, b in enumerate(parts):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * len(parts) + d,
                )
            )
    return z


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int | None = None,
    bits: int = ZORDER_BITS,
    mode: str = "width",
) -> None:
    """Write ``df`` as parquet range-sorted by the Z-order key of
    ``cols`` — every file covers a compact hyper-rectangle, so min/max
    stats prune on any of the Z-ordered columns."""
    keyed = df.withColumn("__z", zorder_key(df, cols, bits, mode))
    part = (
        keyed.repartitionByRange(n_files, F.col("__z"))
        if n_files is not None
        else keyed.repartitionByRange(F.col("__z"))
    )
    part.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
) -> None:
    """Hive-style partitioned write with DYNAMIC partition overwrite:
    only the partitions present in ``df`` are replaced; every other
    partition on disk is untouched.

    The backfill primitive: re-running one day of a date-partitioned
    table (late data, a fixed bug) must not truncate the other 3,650
    days the way a plain ``mode("overwrite")`` does.  Readers prune on
    the partition column for free (``PartitionFilters`` in the scan).

    Scale: the write shuffles nothing by itself; pair with
    ``df.repartition(*partition_cols)`` upstream when many tasks would
    otherwise each open a file per partition (the small-files problem).
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


TARGET_FILE_BYTES = 128 * 1024 * 1024  # the parquet sweet-spot floor


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    order_cols: Sequence[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    the OPTIMIZE/compaction step for tables that accrete small files
    (streaming sinks, per-batch appends, over-parallel writes).

    Returns the output file count.  File count = ceil(current bytes /
    target), computed from the existing footprint — no data pass needed
    to size the job.  With ``order_cols`` the rewrite also range-sorts
    (a `write_sorted_parquet` pass), folding compaction and layout into
    the single rewrite a maintenance window gets.

    Scale: the rewrite is one shuffle-free coalesce when shrinking file
    count (or one range exchange when sorting); readers meanwhile see
    the OLD files until the directory swap at the end.

    Swap + crash recovery (ADVICE r4): the swap is two renames
    (``path → path__old``, then ``path__compacting → path``) — POSIX
    gives no multi-directory atomic swap, so instead of pretending, the
    ORIGINAL is kept at ``path__old`` until the new table is in place,
    and the next invocation self-heals every crash window: table
    missing + ``__old`` present → restore the original; stale
    ``__compacting``/``__old`` leftovers → removed.  No window loses
    data.

    Hive-partitioned tables (``key=value`` subdirs — e.g. the IVF
    postings this maintains) are detected and re-written WITH the same
    ``partitionBy``, preserving the pruning layout; each partition
    value compacts to one file (``order_cols`` is rejected there — a
    global range sort would have to straddle partition dirs).

    LOCAL-FS ONLY, enforced: the byte sizing and the swap use the local
    filesystem; a DFS path (``hdfs://``, ``s3a://``) raises — on a
    cluster, compaction belongs to the table format's OPTIMIZE, not a
    directory swap.
    """
    import math
    import os
    import re
    import shutil
    from urllib.parse import urlparse

    if urlparse(path).scheme not in ("", "file"):
        raise ValueError(
            f"compact_parquet swaps LOCAL directories; {path!r} is not a "
            f"local path — use the table format's OPTIMIZE on a cluster"
        )
    path = path.rstrip("/")
    tmp = path + "__compacting"
    old = path + "__old"
    # Self-heal prior crash windows before touching anything.
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)  # crashed between the two renames: restore
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # half-written rewrite from a prior crash
    if os.path.exists(old):
        shutil.rmtree(old)  # swap completed earlier; backup never cleaned

    part_cols: list[str] = []
    for entry in sorted(os.listdir(path)):
        m = re.fullmatch(r"([^=]+)=[^=]*", entry)
        if m and os.path.isdir(os.path.join(path, entry)):
            part_cols = [m.group(1)]
            # nested partition levels: descend first child chain
            probe = os.path.join(path, entry)
            while True:
                subs = [
                    s
                    for s in sorted(os.listdir(probe))
                    if os.path.isdir(os.path.join(probe, s)) and "=" in s
                ]
                if not subs:
                    break
                part_cols.append(subs[0].split("=", 1)[0])
                probe = os.path.join(probe, subs[0])
            break
    if part_cols and order_cols:
        raise ValueError(
            f"compact_parquet: {path!r} is hive-partitioned by {part_cols}; "
            f"a global range sort would destroy the partition layout — "
            f"compact without order_cols, or sort within a single partition"
        )

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))

    if part_cols:
        df = spark.read.option("basePath", path).parquet(path)
        # one task per partition value (hash co-location), one file per
        # value inside its key=value dir — the pruning layout survives
        (
            df.repartition(n_files, *part_cols)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp)
        )
    else:
        df = spark.read.parquet(path)
        if order_cols:
            write_sorted_parquet(df, tmp, order_cols, n_files=n_files)
        else:
            df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)  # original stays at __old until this succeeds
    shutil.rmtree(old)
    return n_files
