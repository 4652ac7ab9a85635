"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all headline queries (each fully
materialized via a count-collect so the whole plan executes).  Individual
per-query seconds go under ``queries``.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_QUERIES (comma-list to subset).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the queries whose plans exercise the scale-critical paths
# (big-table agg, fact-chain joins + window dedup, top-k window, dedup and
# similarity operators as they land).  Keep this list in sync with
# SCALE.md's plan reviews.
DEFAULT_HEADLINE = [
    "pricing_summary",
    "flagship_revenue",
    "top_customers_per_region",
    "star_hecho_ventas",
    "star_dim_cliente",
    "minhash_near_dup",
    "ngram_jaccard_neardup",
    "simhash_near_dup",
    "exact_dedup_documents",
    "ann_cosine_topk",
    "ivf_cosine_topk",
    "lsh_cosine_neardup",
    "embedding_cosine_neardup",
    "text_quality",
    "token_count_bpe",
    "media_feature_extract",
    "events_sessionize",
    "events_tumbling_hourly",
    "purchases_asof_clicks",
    "clicks_before_purchase",
    "orders_price_percentiles",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from export_oltp_to_olap_spark.session import get_spark
    from export_oltp_to_olap_spark import registry

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    qs = registry.queries()
    wanted = os.environ.get("BENCH_QUERIES")
    names = (
        [n.strip() for n in wanted.split(",") if n.strip()]
        if wanted
        else [n for n in DEFAULT_HEADLINE if n in qs]
    )

    # Warm the JVM + parquet footers with one tiny action so per-query
    # timings measure the plan, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # materialize the full plan
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
