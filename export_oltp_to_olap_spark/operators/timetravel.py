"""Time travel on the plain-parquet lake: versioned publishes, version
reads, retention vacuum, and version-to-version diffs.

The publish discipline is the one the engine already trusts for
standing state (`streaming/curation_stream.leakage_safe_split_sink`):
each publish writes a full snapshot under ``root/v{N}/`` and writes a
``_COMMITTED`` marker LAST, so a crash mid-publish leaves an
uncommitted directory that every reader ignores — the previous
committed version stays the readable table, never zero copies (the
same guarantee `operators/merge.py`'s swap gives the current table,
extended to a retained history).  On Delta/Iceberg this module
collapses to ``VERSION AS OF`` / ``snapshot-id`` reads plus ``VACUUM``;
the parquet path keeps the semantics dependency-free for the harness.

Scale notes: a publish is one partitioned parquet write (no
read-modify of prior versions — snapshots are immutable); version
listing reads directory names + marker existence, never data; vacuum
deletes whole version directories.  Retention is the operator's knob —
time travel is bounded by what vacuum keeps, exactly as in the table
formats.  `diff_versions` reuses `operators/diff.snapshot_diff`
(full-outer join keyed on the table key, drifted rows only), so
"what changed between v3 and v7" is one key-partitioned join over two
snapshots, not a replay of the publishes between them.
"""

from __future__ import annotations

import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from export_oltp_to_olap_spark.operators.diff import snapshot_diff

_VDIR_RE = re.compile(r"^v(\d+)$")
_MARKER = "_COMMITTED"


def committed_versions(root: str) -> list[int]:
    """Ascending committed version numbers under ``root`` (uncommitted
    — crashed — publish directories are invisible here and everywhere
    downstream)."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _VDIR_RE.match(name)
        if m and os.path.exists(os.path.join(root, name, _MARKER)):
            out.append(int(m.group(1)))
    return sorted(out)


def _vdir(root: str, version: int) -> str:
    return os.path.join(root, f"v{version}")


def versioned_publish(df: DataFrame, root: str) -> int:
    """Publish ``df`` as the next committed snapshot of ``root`` and
    return its version number.  Marker written LAST — a crash before it
    leaves an ignorable partial directory, and re-running the publish
    simply takes the next free version number."""
    versions = committed_versions(root)
    next_v = (versions[-1] + 1) if versions else 1
    # skip over crashed partial dirs so we never write into one
    while os.path.exists(_vdir(root, next_v)):
        next_v += 1
    vdir = _vdir(root, next_v)
    df.write.mode("overwrite").parquet(vdir)
    with open(os.path.join(vdir, _MARKER), "w", encoding="utf-8") as fh:
        fh.write("ok\n")
    return next_v


def read_table_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a committed snapshot — the latest when ``version`` is None
    (the plain-table read), else exactly ``VERSION AS OF version``."""
    versions = committed_versions(root)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not committed under {root} "
            f"(committed: {versions} — vacuumed or crashed?)"
        )
    return spark.read.parquet(_vdir(root, version))


UNCOMMITTED_GRACE_SECONDS = 3600


def vacuum_versions(
    root: str,
    keep_last: int = 2,
    uncommitted_grace_seconds: float = UNCOMMITTED_GRACE_SECONDS,
) -> list[int]:
    """Drop all but the newest ``keep_last`` committed versions, plus
    uncommitted partial directories OLDER than
    ``uncommitted_grace_seconds``; returns the removed version numbers.
    Time travel reaches only what retention keeps — the table-format
    VACUUM contract.

    The grace window exists because a publish still in flight (parquet
    written, ``_COMMITTED`` marker not yet created) is indistinguishable
    on disk from a crashed one (ADVICE r11) — Delta/Iceberg VACUUM uses
    a retention window for exactly this reason.  An mtime younger than
    the window marks a possibly-live writer and the directory is
    skipped; pass ``uncommitted_grace_seconds=0`` only when the caller
    KNOWS no publish is concurrent (the single-writer maintenance
    window), which is how the crash-recovery tests exercise immediate
    cleanup."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (never zero copies)")
    versions = committed_versions(root)
    keep = set(versions[-keep_last:])
    removed = []
    if not os.path.isdir(root):
        return removed
    now = time.time()
    for name in os.listdir(root):
        m = _VDIR_RE.match(name)
        if not m:
            continue
        v = int(m.group(1))
        committed = v in versions
        if not committed:
            try:
                age = now - os.path.getmtime(os.path.join(root, name))
            except OSError:  # pragma: no cover - raced by its own writer
                continue
            if age < uncommitted_grace_seconds:
                continue  # possibly a publish in flight — retention skips it
        if (committed and v not in keep) or not committed:
            shutil.rmtree(os.path.join(root, name))
            if committed:
                removed.append(v)
    return sorted(removed)


def diff_versions(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Drifted rows between two committed snapshots —
    ``snapshot_diff`` (added/removed/changed + changed_cols) over the
    two version reads."""
    a = read_table_version(spark, root, v_old)
    b = read_table_version(spark, root, v_new)
    return snapshot_diff(a, b, key_cols, compare_cols)
