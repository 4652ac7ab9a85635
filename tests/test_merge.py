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
