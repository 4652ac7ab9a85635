"""Layout writers (sources/layout.py): files must actually carry the
narrow min/max statistics that make predicate pushdown prune."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, sf001):
    # load_tables normalizes the fixture's TIMESTAMP_NTZ physical type —
    # a raw read leaves ts uncastable to numeric (unix_micros rejects NTZ).
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    return load_tables(spark, sf001, ("events",))["events"].select(
        "user_id", "ts", "value"
    )


def _file_spans(path, col):
    """(min, max) per output file for ``col``, from parquet row-group
    statistics — exactly what a pruning scan consults."""
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        los, his = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        if los:
            spans.append((min(los), max(his)))
    return spans


def _avg_span_fraction(spans, lo, hi):
    width = (hi - lo) or 1
    return sum((s_hi - s_lo) / width for s_lo, s_hi in spans) / len(spans)


def test_sorted_write_gives_disjoint_file_ranges(spark, events, tmp_path):
    from export_oltp_to_olap_spark.sources.layout import write_sorted_parquet

    # Numeric sort key: the parquet writer emits no row-group statistics
    # for this fixture's timestamp type, and a pruning claim needs stats.
    ev = events.withColumn("ts_num", F.col("ts").cast("double"))
    path = str(tmp_path / "by_ts")
    write_sorted_parquet(ev, path, ["ts_num"], n_files=8)
    spans = sorted(_file_spans(path, "ts_num"))
    assert len(spans) > 2
    # Range partitioning + in-file sort → consecutive files don't overlap,
    # so a time-range predicate prunes to O(matching) files.
    for (_, prev_hi), (next_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= next_lo, "file time ranges overlap"
    # And the data survived intact.
    assert spark.read.parquet(path).count() == ev.count()


def test_zorder_prunes_on_both_dimensions(spark, events, tmp_path):
    """Z-order's point: BOTH columns get narrow per-file spans.  A linear
    sort on ts gives user_id per-file spans ≈ the full range (no pruning
    on the second dimension); the Z-ordered layout must beat that
    decisively on user_id while keeping ts spans far under full-range."""
    from export_oltp_to_olap_spark.sources.layout import (
        write_sorted_parquet,
        write_zorder_parquet,
    )

    ev = events.withColumn("ts_num", F.col("ts").cast("double"))
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zorder_parquet(ev, zpath, ["user_id", "ts_num"], n_files=16)
    write_sorted_parquet(ev, spath, ["ts_num"], n_files=16)

    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_num"), F.max("ts_num")
    ).first()

    z_user = _avg_span_fraction(_file_spans(zpath, "user_id"), lo_u, hi_u)
    z_ts = _avg_span_fraction(_file_spans(zpath, "ts_num"), lo_t, hi_t)
    lin_user = _avg_span_fraction(_file_spans(spath, "user_id"), lo_u, hi_u)

    assert lin_user > 0.9, "control: ts-sorted files should span ~all user_ids"
    assert z_user < 0.6, f"z-order user_id span fraction {z_user:.2f}"
    assert z_ts < 0.6, f"z-order ts span fraction {z_ts:.2f}"
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_key_is_deterministic_and_total(spark, events):
    from export_oltp_to_olap_spark.sources.layout import zorder_key

    ev = events.withColumn("ts_num", F.col("ts").cast("double"))
    k1 = ev.select(zorder_key(ev, ["user_id", "ts_num"]).alias("z")).collect()
    k2 = ev.select(zorder_key(ev, ["user_id", "ts_num"]).alias("z")).collect()
    assert [r.z for r in k1] == [r.z for r in k2]
    assert all(r.z is not None and r.z >= 0 for r in k1)


def test_dynamic_partition_overwrite_backfills_only_touched_days(spark, tmp_path):
    """Rewriting one day's partition must leave every other day intact
    (and a plain overwrite would NOT — asserted as the contrast)."""
    from pyspark.sql import functions as F

    from export_oltp_to_olap_spark.sources.layout import write_partitioned_parquet

    path = str(tmp_path / "events_by_day")
    days = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0), (3, "2024-01-03", 30.0)],
        "event_id long, day string, value double",
    )
    write_partitioned_parquet(days, path, ["day"])

    # backfill day 2 with corrected data
    fix = spark.createDataFrame(
        [(2, "2024-01-02", 99.0), (4, "2024-01-02", 1.0)],
        "event_id long, day string, value double",
    )
    write_partitioned_parquet(fix, path, ["day"])

    # note: partition-column type inference reads `day` back as DATE
    got = {
        (r["event_id"], str(r["day"])): r["value"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "2024-01-01"): 10.0,  # untouched
        (2, "2024-01-02"): 99.0,  # replaced
        (4, "2024-01-02"): 1.0,  # added
        (3, "2024-01-03"): 30.0,  # untouched
    }
    # partition pruning reaches the scan
    plan = (
        spark.read.parquet(path)
        .where(F.col("day") == "2024-01-02")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "2024-01-02" in plan


def test_compact_parquet_merges_small_files(spark, events, tmp_path):
    from export_oltp_to_olap_spark.sources.layout import compact_parquet

    path = str(tmp_path / "frag")
    events.repartition(40).write.parquet(path)  # simulate per-batch spray
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert len(glob.glob(f"{path}/part-*.parquet")) == 40

    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{path}/part-*.parquet")) == 1
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    assert not glob.glob(f"{path}__*")  # temp/old dirs cleaned up


def test_compact_parquet_with_sort_restores_pruning(spark, events, tmp_path):
    from export_oltp_to_olap_spark.sources.layout import compact_parquet

    path = str(tmp_path / "frag")
    events.repartition(16).write.parquet(path)  # arrival order: wide spans
    compact_parquet(
        spark, path, target_file_bytes=len(events.columns) * 40_000, order_cols=["user_id"]
    )
    spans = _file_spans(path, "user_id")
    assert len(spans) >= 2
    # Sorted rewrite → narrow per-file ranges (arrival order gives ~1.0).
    lo = min(s[0] for s in spans)
    hi = max(s[1] for s in spans)
    assert _avg_span_fraction(spans, lo, hi) < 0.6  # vs ~1.0 for arrival order


def test_zorder_depth_mode_resists_skew(spark):
    """Under heavy skew, equi-width cells collapse (most rows share one
    bucket) while equi-depth cells stay ~uniform — the property that
    keeps file spans narrow on skewed columns."""
    from collections import Counter

    from export_oltp_to_olap_spark.sources.layout import zorder_key

    # x = k^6: over half the rows land in the lowest 1/16th of the range.
    df = spark.range(0, 4000).selectExpr(
        "id", "CAST(pow(id % 1000, 6) AS DOUBLE) AS x", "CAST(id AS DOUBLE) AS y"
    )
    wkey = df.select(zorder_key(df, ["x", "y"], bits=4, mode="width").alias("z"), "x")
    dkey = df.select(zorder_key(df, ["x", "y"], bits=4, mode="depth").alias("z"), "x")

    def bucket_hist(rows):
        # recover x's bucket from the interleaved key: x bits sit at even
        # positions (dim 0 of 2)
        c = Counter()
        for r in rows:
            z = r["z"]
            b = sum(((z >> (2 * i)) & 1) << i for i in range(4))
            c[b] += 1
        return c

    wh = bucket_hist(wkey.collect())
    dh = bucket_hist(dkey.collect())
    assert wh.most_common(1)[0][1] > 0.5 * 4000  # width: one bucket hogs
    assert dh.most_common(1)[0][1] < 0.2 * 4000  # depth: spread out
    assert len(dh) >= 12  # nearly all 16 cells populated


def test_zorder_depth_bits_cap(spark):
    import pytest as _pytest

    from export_oltp_to_olap_spark.sources.layout import zorder_key

    df = spark.range(10).selectExpr("CAST(id AS DOUBLE) AS x", "CAST(id AS DOUBLE) AS y")
    with _pytest.raises(ValueError, match="caps bits"):
        zorder_key(df, ["x", "y"], bits=16, mode="depth")


def test_compact_parquet_preserves_hive_partitioning(spark, events, tmp_path):
    """ADVICE r4: compacting a hive-partitioned table (e.g. the IVF
    postings) must re-write WITH the same partitionBy — the key=value
    dirs, their contents, and partition pruning all survive; each
    partition value compacts its file spray down."""
    from export_oltp_to_olap_spark.sources.layout import compact_parquet

    path = str(tmp_path / "parts")
    base = events.withColumn("bucket", F.col("user_id") % 4)
    base.repartition(8).write.partitionBy("bucket").parquet(path)
    before = sorted(
        tuple(r) for r in spark.read.parquet(path).select(*base.columns).collect()
    )
    dirs_before = sorted(
        d for d in os.listdir(path) if d.startswith("bucket=")
    )
    n_files_before = len(glob.glob(f"{path}/bucket=*/part-*.parquet"))

    compact_parquet(spark, path, target_file_bytes=1 << 30)

    assert sorted(
        d for d in os.listdir(path) if d.startswith("bucket=")
    ) == dirs_before, "partition directories destroyed"
    after = sorted(
        tuple(r) for r in spark.read.parquet(path).select(*base.columns).collect()
    )
    assert after == before
    assert len(glob.glob(f"{path}/bucket=*/part-*.parquet")) < n_files_before
    # pruning still works: a partition filter lists only its directory
    pruned = spark.read.parquet(path).where(F.col("bucket") == 2)
    assert pruned.count() == sum(1 for r in before if r[-1] == 2)

    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, path, order_cols=["user_id"])


def test_compact_parquet_crash_windows_self_heal(spark, events, tmp_path):
    """Every crash window leaves a recoverable state: the next
    invocation restores/cleans and completes the compaction."""
    import shutil

    from export_oltp_to_olap_spark.sources.layout import compact_parquet

    path = str(tmp_path / "frag")
    events.repartition(10).write.parquet(path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    # window 1: crashed between the two renames — table gone, __old holds it
    os.rename(path, path + "__old")
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before
    assert not glob.glob(f"{path}__*")

    # window 2: crashed mid-rewrite — stale __compacting, table intact
    os.makedirs(path + "__compacting")
    with open(path + "__compacting/garbage", "w") as fh:
        fh.write("partial")
    # window 3 at once: crashed after swap, backup never removed
    shutil.copytree(path, path + "__old")
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before
    assert not glob.glob(f"{path}__*")


def test_compact_parquet_refuses_non_local_paths(spark):
    from export_oltp_to_olap_spark.sources.layout import compact_parquet

    with pytest.raises(ValueError, match="local"):
        compact_parquet(spark, "s3a://bucket/table")
