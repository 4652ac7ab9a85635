"""Command-line entry points — parity with the reference's process surface.

Reference entry points (SURVEY.md §3):

* ``python sync_oltp_to_olap.py``                     → ``sync`` (full)
* ``python sync_oltp_to_olap.py --table T --op O --id N`` → ``sync --table …``
* ``python main.py worker`` (LISTEN/NOTIFY loop)       → ``worker``
* ``python main.py once`` (one-shot full sync)         → ``once``

The ``--op`` flag is accepted and ignored exactly like the reference
(deletes are not propagated — ref sync_oltp_to_olap.py:416-423, SURVEY.md
§3.2).  The web entry point (HTTP health/trigger, ref main.py:120-133) is
an ops concern outside the engine; its observables map to
``StreamingQuery.lastProgress`` and Spark's own UI/metrics.

Sources: ``--source-dir`` points at fixture-shaped parquet (the harness
path).  A production deployment swaps ``load_oltp`` for JDBC reads via
``sources.jdbc.read_jdbc_table`` — same downstream plans.

Usage examples::

    python -m export_oltp_to_olap_spark.cli sync \
        --source-dir /root/testdata/sf0.001 --target-dir /tmp/olap
    python -m export_oltp_to_olap_spark.cli sync \
        --source-dir /root/testdata/sf0.001 --target-dir /tmp/olap \
        --table orden --op update --id 7
    python -m export_oltp_to_olap_spark.cli worker \
        --feed-dir /tmp/feed --target-dir /tmp/olap --checkpoint /tmp/ckpt
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def load_oltp(spark: SparkSession, source_dir: str):
    from export_oltp_to_olap_spark.plans.fixtures_adapter import oltp_tables_from_fixtures
    from export_oltp_to_olap_spark.sources.parquet import load_tables

    tables = load_tables(
        spark,
        source_dir,
        ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"),
    )
    return oltp_tables_from_fixtures(tables)


def cmd_sync(args: argparse.Namespace, spark: SparkSession) -> int:
    """Full or per-record incremental sync (ref §3.1 / §3.2)."""
    from export_oltp_to_olap_spark.plans.star import (
        build_star,
        build_star_incremental,
        merge_star,
        write_star,
    )

    oltp = load_oltp(spark, args.source_dir)
    if args.table is None:
        star = build_star(oltp, sk_mode=args.sk_mode)
        if args.full_refresh:
            write_star(star, args.target_dir)
        else:
            merge_star(spark, star, args.target_dir)
        print(f"sync: full rebuild merged into {args.target_dir}")
    else:
        if args.sk_mode == "dense_rank":
            print(
                "sync: incremental merge requires stable surrogate keys; "
                "using --sk-mode xxhash64 (see SCALE.md)",
                file=sys.stderr,
            )
            args.sk_mode = "xxhash64"
        star = build_star_incremental(
            oltp, args.table, args.op, args.id, sk_mode=args.sk_mode
        )
        merge_star(spark, star, args.target_dir)
        print(f"sync: incremental {args.table} id={args.id} merged into {args.target_dir}")
    return 0


def cmd_worker(args: argparse.Namespace, spark: SparkSession) -> int:
    """CDC worker: event feed → streaming merge (ref §3.3)."""
    from export_oltp_to_olap_spark.streaming.cdc import start_cdc_stream

    oltp = load_oltp(spark, args.source_dir)
    query = start_cdc_stream(
        spark,
        args.feed_dir,
        oltp,
        args.target_dir,
        args.checkpoint,
        available_now=not args.continuous,
    )
    query.awaitTermination()
    print(f"worker: drained feed {args.feed_dir} into {args.target_dir}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="export_oltp_to_olap_spark")
    sub = p.add_subparsers(dest="command", required=True)

    sync = sub.add_parser("sync", help="full or incremental star sync (ref §3.1/§3.2)")
    sync.add_argument("--source-dir", required=True)
    sync.add_argument("--target-dir", required=True)
    sync.add_argument("--table", default=None, help="changed OLTP table (incremental)")
    sync.add_argument("--op", default=None, help="accepted and ignored, like the reference")
    sync.add_argument("--id", type=int, default=None, help="changed record id")
    sync.add_argument("--sk-mode", default="xxhash64", choices=["xxhash64", "dense_rank"])
    sync.add_argument(
        "--full-refresh",
        action="store_true",
        help="overwrite targets instead of merging (initial load)",
    )
    sync.set_defaults(fn=cmd_sync)

    once = sub.add_parser("once", help="one-shot full sync (ref main.py once)")
    once.add_argument("--source-dir", required=True)
    once.add_argument("--target-dir", required=True)
    once.add_argument("--sk-mode", default="xxhash64", choices=["xxhash64", "dense_rank"])
    once.set_defaults(fn=cmd_sync, table=None, op=None, id=None, full_refresh=False)

    worker = sub.add_parser("worker", help="streaming CDC merge (ref main.py worker)")
    worker.add_argument("--source-dir", required=True)
    worker.add_argument("--feed-dir", required=True)
    worker.add_argument("--target-dir", required=True)
    worker.add_argument("--checkpoint", required=True)
    worker.add_argument(
        "--continuous",
        action="store_true",
        help="keep running (default drains the feed and exits, like `once`)",
    )
    worker.set_defaults(fn=cmd_worker)
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    if spark is None:
        from export_oltp_to_olap_spark.session import get_spark

        spark = get_spark(app_name=f"cli-{args.command}")
    return args.fn(args, spark)


if __name__ == "__main__":
    raise SystemExit(main())
