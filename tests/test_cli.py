"""CLI entry-point parity (ref §3 lifecycle: sync / incremental / worker)."""

from __future__ import annotations

import json
import os

from export_oltp_to_olap_spark.cli import main
from export_oltp_to_olap_spark.plans.star import STAR_WRITE_ORDER, star_table_path

SRC = "/root/testdata/sf0.001"


def _read(spark, target, name):
    return spark.read.parquet(star_table_path(target, name))


def test_cli_full_sync_writes_star(spark, tmp_path):
    target = str(tmp_path / "olap")
    rc = main(["sync", "--source-dir", SRC, "--target-dir", target], spark=spark)
    assert rc == 0
    for name in STAR_WRITE_ORDER:
        assert _read(spark, target, name).count() > 0, name


def test_cli_incremental_sync_converges(spark, tmp_path):
    target = str(tmp_path / "olap")
    main(["sync", "--source-dir", SRC, "--target-dir", target], spark=spark)
    before = sorted(map(tuple, _read(spark, target, "hecho_ventas").collect()))
    rc = main(
        [
            "sync",
            "--source-dir",
            SRC,
            "--target-dir",
            target,
            "--table",
            "orden",
            "--op",
            "update",
            "--id",
            "7",
        ],
        spark=spark,
    )
    assert rc == 0
    after = sorted(map(tuple, _read(spark, target, "hecho_ventas").collect()))
    assert before == after  # re-sync of unchanged data is a no-op


def test_cli_worker_drains_feed(spark, tmp_path):
    target = str(tmp_path / "olap")
    feed = tmp_path / "feed"
    feed.mkdir()
    with open(feed / "events.json", "w") as f:
        for i in (7, 8):
            f.write(
                json.dumps(
                    {"table": "orden", "op": "update", "record_id": i,
                     "ts": "2026-01-01 00:00:00"}
                )
                + "\n"
            )
    rc = main(
        [
            "worker",
            "--source-dir",
            SRC,
            "--feed-dir",
            str(feed),
            "--target-dir",
            target,
            "--checkpoint",
            str(tmp_path / "ckpt"),
        ],
        spark=spark,
    )
    assert rc == 0
    assert os.path.exists(star_table_path(target, "hecho_ventas"))
    assert _read(spark, target, "hecho_ventas").count() > 0
