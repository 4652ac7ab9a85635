"""Event-driven CDC: Structured Streaming replacement for the reference's
LISTEN/NOTIFY worker (ref ``worker_sync.py``; SURVEY.md §3.3, §2.I1-I6).

The reference subscribes to six Postgres NOTIFY channels and forks one
Python subprocess per event to re-sync a single record — at-most-once
delivery (notifications die with the worker, ref ``worker_sync.py:85-86``),
with a full re-sync as the recovery path.  The Spark rewrite is one
long-lived streaming query:

    readStream(event feed) → foreachBatch(apply_cdc_events) → merged star

* **Source**: a JSON file feed where each row is one change event
  ``(table, op, record_id, ts)`` — the decoded form of a NOTIFY
  (channel → table, payload → op:id, ref ``worker_sync.py:88-93``;
  decoding raw pairs is ``functions.events.decode_cdc_event``).  In
  production the same rows arrive from Kafka/Debezium; the source swap is
  one line because everything downstream sees the same schema.
* **Batch semantics**: each micro-batch is grouped by table and applied as
  a set-wise incremental rebuild (``filter_oltp_for_keys``) + idempotent
  key-merge — the reference's one-subprocess-per-event becomes one Spark
  job per (batch × affected table), independent of event count.
* **Delivery**: checkpointing makes this exactly-once-per-batch — strictly
  stronger than the reference's at-most-once (SURVEY.md §2.I4).  Because
  every merge is an idempotent upsert of *current* OLTP state, replays and
  late events converge to the same final state with no watermark needed
  (the reference's implicit late-data story, §2.I3).
* **Surrogate keys**: incremental merges REQUIRE ``xxhash64`` SK mode.
  ``dense_rank`` ids are relative to the slice being built and would
  collide with ids already in the stored star (SURVEY.md §7.4) —
  ``apply_cdc_events`` refuses them.
"""

from __future__ import annotations

import os
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from export_oltp_to_olap_spark.plans.star import (
    STAR_WRITE_ORDER,
    build_star,
    filter_oltp_for_keys,
    merge_star,
)

# One change event = one row.  By default `op` is carried but ignored
# (deletes are not propagated), exactly like the reference's unused --op
# (ref sync_oltp_to_olap.py:416-423; SURVEY.md §3.2);
# ``propagate_deletes=True`` upgrades to tombstone semantics (beyond
# reference parity — see apply_cdc_deletes).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("table", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("record_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

KNOWN_TABLES = ("clientes", "categoria", "productos", "ventas", "orden", "orden_producto")

# Which OLAP tables one event table can touch — the reference's dispatcher
# routing (ref :367-404): dim events update their dimension only; fact
# events update the fact plus every dimension its upserts/placeholders can
# reach (J5 surrogate upserts, J4 placeholder repair, orden→cliente
# cascade).  Merging only these keeps the lazily-built star from ever
# executing untouched plans.
AFFECTED_TARGETS: dict[str, tuple[str, ...]] = {
    "clientes": ("dim_cliente",),
    "categoria": ("dim_categoria",),
    "productos": ("dim_producto",),
    "ventas": STAR_WRITE_ORDER,
    "orden": STAR_WRITE_ORDER,
    "orden_producto": STAR_WRITE_ORDER,
}

# Dim-only events upsert their dimension straight from its source, no
# placeholder repair (ref _sync_clientes/_sync_categorias/_sync_productos,
# :194-236): repairing against the unrestricted fact source would mint
# NULL placeholders for every key outside the event slice and clobber
# stored rows on merge.
_DIM_ONLY = frozenset({"clientes", "categoria", "productos"})


def read_event_feed(
    spark: SparkSession, feed_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming DataFrame over the JSON event feed (A11 analog)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(feed_dir)


# Driver-side bound on distinct (table, record_id) keys collected per
# micro-batch.  Beyond this, enumerating keys stops paying for itself (the
# IN-filters it feeds grow past what pushdown handles well) and the
# collect() would otherwise grow with batch cardinality without limit —
# the full-rebuild fallback is the same recovery path the reference uses
# for unknown events (ref :402-404) and converges identically because
# every merge is an idempotent upsert of current OLTP state.
MAX_COLLECTED_KEYS = 10_000


def apply_cdc_events(
    batch: DataFrame,
    oltp: dict[str, DataFrame],
    target_dir: str,
    sk_mode: str = "xxhash64",
    max_keys: int = MAX_COLLECTED_KEYS,
    propagate_deletes: bool = False,
) -> None:
    """Apply one micro-batch of change events to the stored star.

    Mirrors the reference dispatcher per event *table* instead of per
    event: for each table with events, build the affected star slice and
    key-merge it.  Unknown tables, NULL record ids, or more than
    ``max_keys`` distinct changed keys trigger the reference's full-sync
    fallback (ref :99-102, :402-404) — so driver memory for the collected
    key list is bounded regardless of micro-batch size.

    ``propagate_deletes=False`` (default) ignores ``op`` like the
    reference.  ``True`` upgrades to tombstone semantics: per
    (table, record_id) the LATEST event by ``ts`` decides (delete wins
    ties), upserts merge as usual (with fact lineage retained — the
    stored star must have been seeded with ``keep_lineage=True``), and
    deletes are routed by ``apply_cdc_deletes`` AFTER the merges, fully
    distributed (never collected), so the overflow fallback still
    applies them.
    """
    if sk_mode == "dense_rank":
        raise ValueError(
            "dense_rank surrogate keys are slice-relative and would corrupt "
            "a merged star; incremental/streaming merges need sk_mode='xxhash64'"
        )
    spark = batch.sparkSession
    if propagate_deletes:
        from export_oltp_to_olap_spark.operators.dedup import latest_by_key

        latest = latest_by_key(
            batch.select("table", "record_id", "op", "ts"),
            ["table", "record_id"],
            [
                F.col("ts").desc(),
                (F.lower(F.col("op")) == "delete").cast("int").desc(),
            ],
        )
        deletes = latest.where(F.lower(F.col("op")) == "delete")
        upsert_events = latest.where(
            (F.lower(F.col("op")) != "delete") | F.col("op").isNull()
        )
    else:
        deletes = None
        upsert_events = batch

    # limit(max_keys + 1): collect at most one row past the cap — enough
    # to detect overflow, never an unbounded driver materialization.
    events = (
        upsert_events.select("table", "record_id")
        .distinct()
        .limit(max_keys + 1)
        .collect()
    )
    if len(events) > max_keys:
        merge_star(
            spark,
            build_star(oltp, sk_mode=sk_mode, keep_lineage=propagate_deletes),
            target_dir,
        )
    else:
        by_table: dict[str, list[int]] = defaultdict(list)
        full_sync = False
        for row in events:
            t = (row["table"] or "").lower()
            if t not in KNOWN_TABLES or row["record_id"] is None:
                full_sync = True
                continue
            by_table[t].append(row["record_id"])

        if full_sync:
            merge_star(
                spark,
                build_star(oltp, sk_mode=sk_mode, keep_lineage=propagate_deletes),
                target_dir,
            )
        else:
            for t in sorted(by_table):
                star = build_star(
                    filter_oltp_for_keys(oltp, t, by_table[t]),
                    sk_mode=sk_mode,
                    repair=t not in _DIM_ONLY,
                    keep_lineage=propagate_deletes,
                )
                merge_star(spark, star, target_dir, tables=AFFECTED_TARGETS[t])
    if deletes is not None:
        apply_cdc_deletes(spark, deletes, oltp, target_dir)


def apply_cdc_deletes(
    spark: SparkSession,
    deletes: DataFrame,
    oltp: dict[str, DataFrame],
    target_dir: str,
) -> None:
    """Route DELETE events to OLAP tombstones — beyond reference parity
    (the reference ignores ``--op delete``; VERDICT r3 "What's missing").

    Routing, applied fact-first so dimension reference checks see the
    post-delete fact:

    * ``ventas`` → remove fact rows whose lineage ``id_venta`` matches.
    * ``orden_producto`` → remove fact rows whose lineage ``id_op``
      matches.
    * ``orden`` → map to the order's sale ids via CURRENT OLTP
      (``ventas WHERE id_orden IN ...``) and remove those fact rows.
      Caveat: if the order's ventas were already cascade-deleted from
      OLTP, this mapping is empty — emit per-row delete events per table
      (as Debezium does) and each row tombstones directly.
    * dims (``clientes``/``categoria``/``productos``) → SAFE delete:
      the dim row is removed only when no remaining fact row references
      its natural key; referenced dims survive (referential integrity
      beats the tombstone — same priority as the J4 placeholder repair).

    All key sets are micro-batch-sized DataFrames (broadcast anti-joins),
    never collected.  A grain row whose LWW-losing duplicate survives in
    OLTP reappears on that key's next upsert or full sync — the same
    idempotent-convergence story as the rest of the CDC path.

    Requires the stored fact to carry lineage (seeded with
    ``keep_lineage=True``)."""
    from export_oltp_to_olap_spark.operators.merge import delete_from_parquet
    from export_oltp_to_olap_spark.plans.star import star_table_path

    fact_path = star_table_path(target_dir, "hecho_ventas")
    if os.path.exists(fact_path):
        stored_cols = spark.read.parquet(fact_path).columns
        if "id_venta" not in stored_cols or "id_op" not in stored_cols:
            raise ValueError(
                "delete propagation needs fact lineage columns (id_venta, "
                "id_op); seed/merge the star with keep_lineage=True"
            )

    def _ids(table: str, alias: str) -> DataFrame:
        return (
            deletes.where(F.col("table") == table)
            .where(F.col("record_id").isNotNull())
            .select(F.col("record_id").alias(alias))
            .distinct()
        )

    # Fact tombstones: direct lineage + the orden→ventas cascade mapping.
    venta_ids = _ids("ventas", "id_venta")
    orden_ids = _ids("orden", "id_orden")
    mapped = (
        oltp["ventas"]
        .join(F.broadcast(orden_ids), on="id_orden", how="left_semi")
        .select("id_venta")
    )
    venta_keys = venta_ids.unionByName(mapped).distinct()
    if venta_keys.limit(1).count():
        delete_from_parquet(spark, fact_path, venta_keys, ["id_venta"])
    op_ids = _ids("orden_producto", "id_op")
    if op_ids.limit(1).count():
        delete_from_parquet(spark, fact_path, op_ids, ["id_op"])

    # Dim safe-deletes against the post-tombstone fact.
    fact_now = (
        spark.read.parquet(fact_path) if os.path.exists(fact_path) else None
    )
    for table, dim, nat in (
        ("clientes", "dim_cliente", "id_cliente"),
        ("categoria", "dim_categoria", "id_categoria"),
        ("productos", "dim_producto", "id_producto"),
    ):
        ids = _ids(table, nat)
        if not ids.limit(1).count():
            continue
        deletable = (
            ids.join(fact_now.select(nat).distinct(), on=nat, how="left_anti")
            if fact_now is not None
            else ids
        )
        delete_from_parquet(spark, star_table_path(target_dir, dim), deletable, [nat])


def start_cdc_stream(
    spark: SparkSession,
    feed_dir: str,
    oltp: dict[str, DataFrame],
    target_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    propagate_deletes: bool = False,
) -> StreamingQuery:
    """Launch the CDC query: event feed → foreachBatch merge.

    ``available_now=True`` drains the existing feed and stops (the test /
    reconciliation mode); ``False`` runs continuously like the reference
    worker's select() loop (ref ``worker_sync.py:82-86``).  Progress lives
    in the checkpoint, replacing the heartbeat file (§2.I5) — liveness is
    observable via ``query.lastProgress`` / ``StreamingQueryListener``.
    """
    events = read_event_feed(spark, feed_dir, max_files_per_trigger)

    def _batch(batch_df: DataFrame, _batch_id: int) -> None:
        apply_cdc_events(batch_df, oltp, target_dir, propagate_deletes=propagate_deletes)

    writer = events.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    trigger = {"availableNow": True} if available_now else {"processingTime": "5 seconds"}
    return writer.trigger(**trigger).start()
