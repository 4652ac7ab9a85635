"""Time-travel contracts: versioned publish/read round-trips, crash
recovery (uncommitted directories invisible), vacuum retention, and
diff_versions ≡ an independent snapshot_diff recompute."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.operators import timetravel as tt
from export_oltp_to_olap_spark.operators.diff import snapshot_diff
from export_oltp_to_olap_spark.sources.parquet import load_tables


def _orders(spark, sf001):
    return load_tables(spark, sf001, ("orders",))["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


def test_publish_read_roundtrip_per_version(spark, sf001, tmp_path):
    root = str(tmp_path / "tbl")
    base = _orders(spark, sf001)
    v1 = tt.versioned_publish(base.where(F.col("o_orderkey") % 3 == 0), root)
    v2 = tt.versioned_publish(base.where(F.col("o_orderkey") % 3 <= 1), root)
    v3 = tt.versioned_publish(base, root)
    assert (v1, v2, v3) == (1, 2, 3)
    assert tt.committed_versions(root) == [1, 2, 3]
    n_all = base.count()
    assert tt.read_table_version(spark, root, 3).count() == n_all
    assert tt.read_table_version(spark, root).count() == n_all  # latest
    assert (
        tt.read_table_version(spark, root, 1).count()
        == base.where(F.col("o_orderkey") % 3 == 0).count()
    )


def test_uncommitted_publish_is_invisible_and_skipped(spark, sf001, tmp_path):
    root = str(tmp_path / "tbl")
    base = _orders(spark, sf001)
    tt.versioned_publish(base, root)
    # simulate a crash: data written, marker never landed
    crashed = os.path.join(root, "v2")
    base.limit(5).write.mode("overwrite").parquet(crashed)
    assert tt.committed_versions(root) == [1]
    assert tt.read_table_version(spark, root).count() == base.count()
    # the next publish must not reuse the crashed dir
    v = tt.versioned_publish(base.limit(7), root)
    assert v == 3
    assert tt.committed_versions(root) == [1, 3]
    assert tt.read_table_version(spark, root, 3).count() == 7


def test_vacuum_retention_and_bounds(spark, sf001, tmp_path):
    root = str(tmp_path / "tbl")
    base = _orders(spark, sf001)
    for k in (2, 3, 5, 7):
        tt.versioned_publish(base.limit(k), root)
    # plant a crashed dir too — a just-written uncommitted dir is
    # indistinguishable from a publish IN FLIGHT, so default-grace
    # vacuum must SKIP it (ADVICE r11) ...
    base.limit(1).write.mode("overwrite").parquet(os.path.join(root, "v9"))
    removed = tt.vacuum_versions(root, keep_last=2)
    assert removed == [1, 2]
    assert tt.committed_versions(root) == [3, 4]
    assert os.path.exists(os.path.join(root, "v9"))
    # ... an aged-out one is a crash and goes; grace=0 is the declared
    # single-writer maintenance mode
    tt.vacuum_versions(root, keep_last=2, uncommitted_grace_seconds=0)
    assert not os.path.exists(os.path.join(root, "v9"))
    assert tt.read_table_version(spark, root, 4).count() == 7
    try:
        tt.read_table_version(spark, root, 1)
        raise AssertionError("vacuumed version must not be readable")
    except FileNotFoundError:
        pass


def test_diff_versions_matches_independent_recompute(spark, sf001, tmp_path):
    root = str(tmp_path / "tbl")
    base = _orders(spark, sf001)
    old = base.where(F.col("o_orderkey") % 5 != 0)
    new = base.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    tt.versioned_publish(old, root)
    tt.versioned_publish(new, root)
    got = sorted(
        map(tuple, tt.diff_versions(spark, root, 1, 2, ["o_orderkey"]).collect())
    )
    want = sorted(
        map(
            tuple,
            snapshot_diff(old, new, ["o_orderkey"]).collect(),
        )
    )
    assert got == want and len(got) > 0
    statuses = {r[1] for r in got}
    assert statuses == {"added", "changed"}  # %5-removed rows come BACK in v2


def test_table_versions_cli(spark, sf001, tmp_path):
    """`cli table-versions` lists committed snapshots and vacuums on
    request, reporting what it removed."""
    import json as _json

    from export_oltp_to_olap_spark import cli
    from export_oltp_to_olap_spark.operators import timetravel as tt

    root = str(tmp_path / "tbl")
    base = _orders(spark, sf001)
    for k in (3, 5, 9):
        tt.versioned_publish(base.limit(k), root)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(
            ["table-versions", "--root", root, "--vacuum-keep", "2", "--count"],
            spark=spark,
        )
    assert rc == 0
    out = _json.loads(buf.getvalue())
    assert out["vacuumed"] == [1]
    assert out["committed_versions"] == [2, 3]
    assert out["latest_rows"] == 9
