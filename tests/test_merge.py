"""merge_into_parquet swap semantics + star sk_mode mixing guard.

Round-3 regressions (VERDICT r2 items 4/5): the directory swap must never
leave zero copies of the table on disk, a crashed swap must be recoverable
by the next merge, and a stored star must refuse a merge built with a
different surrogate-key mode.
"""

from __future__ import annotations

import os
import shutil

import pytest

from export_oltp_to_olap_spark.operators.merge import merge_into_parquet


def _rows(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ver long")


def test_merge_upserts_by_key(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_into_parquet(spark, _df(spark, [(1, "a", 1), (2, "b", 1)]), path, ["k"])
    merge_into_parquet(spark, _df(spark, [(2, "B", 2), (3, "c", 1)]), path, ["k"])
    assert _rows(spark, path) == [(1, "a", 1), (2, "B", 2), (3, "c", 1)]


def test_merge_recovers_from_crashed_swap(spark, tmp_path):
    """Simulate a crash between the two swap renames (table moved aside,
    replacement not yet moved in): the next merge must restore the aside
    copy instead of silently starting from an empty table."""
    path = str(tmp_path / "t")
    merge_into_parquet(spark, _df(spark, [(1, "a", 1), (2, "b", 1)]), path, ["k"])
    os.rename(path, f"{path}.__old_merge")  # the mid-swap crash state
    merge_into_parquet(spark, _df(spark, [(2, "B", 2)]), path, ["k"])
    assert _rows(spark, path) == [(1, "a", 1), (2, "B", 2)]
    assert not os.path.exists(f"{path}.__old_merge")


def test_merge_ignores_stale_aside_when_table_exists(spark, tmp_path):
    """A leftover aside copy from an interrupted cleanup must not clobber
    or merge into a healthy current table."""
    path = str(tmp_path / "t")
    merge_into_parquet(spark, _df(spark, [(1, "stale", 1)]), path, ["k"])
    shutil.copytree(path, f"{path}.__old_merge")
    merge_into_parquet(spark, _df(spark, [(1, "fresh", 2)]), path, ["k"])
    assert _rows(spark, path) == [(1, "fresh", 2)]
    assert not os.path.exists(f"{path}.__old_merge")


@pytest.mark.slow
def test_star_refuses_mixed_sk_modes(spark, tmp_path):
    """An initial dense_rank load + an xxhash64 incremental merge would
    interleave two surrogate-key spaces; merge_star must refuse
    (plans/star.py sk_mode metadata guard)."""
    from export_oltp_to_olap_spark.plans.fixtures_adapter import (
        oltp_tables_from_fixtures,
    )
    from export_oltp_to_olap_spark.plans.star import build_star, merge_star, write_star
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    sf0001 = "/root/testdata/sf0.001"
    oltp = oltp_tables_from_fixtures(
        load_tables(
            spark,
            sf0001,
            ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"),
        )
    )
    target = str(tmp_path / "star")
    write_star(build_star(oltp, sk_mode="dense_rank"), target)
    with pytest.raises(ValueError, match="sk_mode"):
        merge_star(spark, build_star(oltp, sk_mode="xxhash64"), target)
    # Same mode is fine, and a full-refresh overwrite resets the mode.
    merge_star(spark, build_star(oltp, sk_mode="dense_rank"), target)
    write_star(build_star(oltp, sk_mode="xxhash64"), target)
    merge_star(spark, build_star(oltp, sk_mode="xxhash64"), target)


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "k long, part string, v string, ver long")


def test_partitioned_merge_upserts_and_prunes(spark, tmp_path):
    """Upsert semantics match the full merge, and partitions untouched by
    the batch keep their exact files on disk (no O(table) rewrite)."""
    import glob

    from export_oltp_to_olap_spark.operators.merge import (
        merge_into_partitioned_parquet,
    )

    path = str(tmp_path / "t")
    merge_into_partitioned_parquet(
        spark,
        _pdf(spark, [(1, "a", "one", 1), (2, "a", "two", 1), (3, "b", "three", 1)]),
        path, ["k"], ["part"],
    )
    b_files_before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=b/*.parquet")
    }
    assert b_files_before

    # second merge touches only partition a
    merge_into_partitioned_parquet(
        spark, _pdf(spark, [(2, "a", "TWO", 2), (4, "a", "four", 1)]),
        path, ["k"], ["part"],
    )
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [
        (1, "one", 1, "a"), (2, "TWO", 2, "a"), (3, "three", 1, "b"), (4, "four", 1, "a"),
    ] or got == sorted(
        [(1, "a", "one", 1), (2, "a", "TWO", 2), (3, "b", "three", 1), (4, "a", "four", 1)]
    )
    b_files_after = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=b/*.parquet")
    }
    assert b_files_after == b_files_before, "untouched partition was rewritten"


def test_partitioned_merge_equals_full_merge(spark, tmp_path):
    """Same final table as merge_into_parquet for a partition-determined
    key space, across a multi-batch history."""
    from export_oltp_to_olap_spark.operators.merge import (
        merge_into_parquet,
        merge_into_partitioned_parquet,
    )

    batches = [
        [(1, "a", "x", 1), (2, "b", "y", 1)],
        [(1, "a", "x2", 2), (3, "b", "z", 1), (4, "c", "w", 1)],
        [(2, "b", "y2", 2)],
    ]
    p_full = str(tmp_path / "full")
    p_part = str(tmp_path / "part")
    for rows in batches:
        merge_into_parquet(spark, _pdf(spark, rows), p_full, ["k"], tiebreak=["ver"])
        merge_into_partitioned_parquet(
            spark, _pdf(spark, rows), p_part, ["k"], ["part"], tiebreak=["ver"]
        )
    full = sorted(
        tuple(r) for r in spark.read.parquet(p_full).select("k", "part", "v", "ver").collect()
    )
    part = sorted(
        tuple(r) for r in spark.read.parquet(p_part).select("k", "part", "v", "ver").collect()
    )
    assert full == part


def test_delete_from_parquet_tombstones_and_recovers(spark, tmp_path):
    """delete_from_parquet removes exactly the keyed rows, is a no-op on
    absent keys/tables, and recovers a crashed swap like the merge path."""
    from export_oltp_to_olap_spark.operators.merge import delete_from_parquet

    path = str(tmp_path / "t")
    merge_into_parquet(
        spark, _df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]), path, ["k"]
    )
    keys = spark.createDataFrame([(2,), (99,)], "k long")  # 99: absent key
    delete_from_parquet(spark, path, keys, ["k"])
    assert _rows(spark, path) == [(1, "a", 1), (3, "c", 1)]

    # Missing table → no-op, no directory created.
    delete_from_parquet(spark, str(tmp_path / "absent"), keys, ["k"])
    assert not os.path.exists(str(tmp_path / "absent"))

    # Crashed mid-swap: table aside, replacement never landed.
    os.rename(path, f"{path}.__old_merge")
    delete_from_parquet(spark, path, spark.createDataFrame([(3,)], "k long"), ["k"])
    assert _rows(spark, path) == [(1, "a", 1)]
    assert not os.path.exists(f"{path}.__old_merge")
