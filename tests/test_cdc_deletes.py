"""CDC delete propagation (beyond reference parity — the reference
ignores --op delete): tombstones route to the right OLAP rows, dims are
safe-deleted only when unreferenced, and the stream converges to the
post-delete OLTP state."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from export_oltp_to_olap_spark.plans.fixtures_adapter import oltp_tables_from_fixtures
from export_oltp_to_olap_spark.plans.star import (
    build_star,
    star_table_path,
    write_star,
)
from export_oltp_to_olap_spark.sources.parquet import load_tables
from export_oltp_to_olap_spark.streaming.cdc import apply_cdc_events

SK = "xxhash64"
TS = datetime.datetime(2026, 1, 1)
EVENT_DDL = "table string, op string, record_id long, ts timestamp"


@pytest.fixture(scope="module")
def oltp(spark, sf0001):
    tables = load_tables(
        spark,
        sf0001,
        ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"),
    )
    return oltp_tables_from_fixtures(tables)


def _seed(spark, oltp, target):
    write_star(build_star(oltp, sk_mode=SK, keep_lineage=True), target)


def _fact(spark, target):
    return spark.read.parquet(star_table_path(target, "hecho_ventas"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_venta_delete_tombstones_then_converges(spark, oltp, tmp_path):
    """Deleting a sale removes its fact rows; after the surviving slice
    re-syncs (orden update event), the store equals a full rebuild from
    the post-delete OLTP — the convergence contract."""
    target = str(tmp_path / "star")
    _seed(spark, oltp, target)

    victim = oltp["ventas"].select("id_venta", "id_orden").first()
    v_id, o_id = int(victim["id_venta"]), int(victim["id_orden"])
    oltp_after = dict(oltp)
    oltp_after["ventas"] = oltp["ventas"].where(F.col("id_venta") != v_id)

    batch = spark.createDataFrame([("ventas", "delete", v_id, TS)], EVENT_DDL)
    apply_cdc_events(batch, oltp_after, target, propagate_deletes=True)
    assert _fact(spark, target).where(F.col("id_venta") == v_id).count() == 0

    # Re-sync the affected order so LWW-losing duplicates (if any)
    # resurface, then compare against the post-delete full build.
    batch2 = spark.createDataFrame([("orden", "update", o_id, TS)], EVENT_DDL)
    apply_cdc_events(batch2, oltp_after, target, propagate_deletes=True)
    want = build_star(oltp_after, sk_mode=SK, keep_lineage=True).hecho_ventas
    assert _rows(_fact(spark, target)) == _rows(want)


def test_orden_delete_cascades_via_current_oltp(spark, oltp, tmp_path):
    """An orden delete removes every fact row of that order's sales
    (mapped through current OLTP ventas)."""
    target = str(tmp_path / "star")
    _seed(spark, oltp, target)

    o_id = int(oltp["ventas"].select("id_orden").first()["id_orden"])
    sale_ids = {
        int(r["id_venta"])
        for r in oltp["ventas"].where(F.col("id_orden") == o_id).collect()
    }
    assert sale_ids
    batch = spark.createDataFrame([("orden", "delete", o_id, TS)], EVENT_DDL)
    apply_cdc_events(batch, oltp, target, propagate_deletes=True)
    remaining = {
        int(r["id_venta"])
        for r in _fact(spark, target).select("id_venta").distinct().collect()
    }
    assert not (remaining & sale_ids)


def test_dim_safe_delete_respects_fact_references(spark, oltp, tmp_path):
    """A referenced customer's dim row survives its delete event; an
    unreferenced customer's dim row is removed."""
    target = str(tmp_path / "star")
    # Every sf0.001 customer owns orders, so inject one synthetic
    # order-less customer to exercise the deletable branch.
    unreferenced = (
        int(oltp["clientes"].agg(F.max("id_cliente")).first()[0]) + 1000
    )
    extra = oltp["clientes"].limit(1).withColumn("id_cliente", F.lit(unreferenced))
    oltp2 = dict(oltp)
    oltp2["clientes"] = oltp["clientes"].unionByName(extra)
    _seed(spark, oltp2, target)
    fact = _fact(spark, target)

    referenced = int(
        fact.select("id_cliente").where(F.col("id_cliente").isNotNull()).first()[0]
    )
    batch = spark.createDataFrame(
        [("clientes", "delete", referenced, TS), ("clientes", "delete", unreferenced, TS)],
        EVENT_DDL,
    )
    apply_cdc_events(batch, oltp2, target, propagate_deletes=True)
    dim = spark.read.parquet(star_table_path(target, "dim_cliente"))
    assert dim.where(F.col("id_cliente") == referenced).count() == 1
    assert dim.where(F.col("id_cliente") == unreferenced).count() == 0


@pytest.mark.slow
def test_latest_op_per_key_decides(spark, oltp, tmp_path):
    """delete-then-update keeps the row (update is later); update-then-
    delete removes it — per-key LWW over the event ts."""
    target = str(tmp_path / "star")
    _seed(spark, oltp, target)

    two = oltp["ventas"].select("id_venta").limit(2).collect()
    keep_id, drop_id = int(two[0][0]), int(two[1][0])
    t0, t1 = TS, TS + datetime.timedelta(seconds=10)
    batch = spark.createDataFrame(
        [
            ("ventas", "delete", keep_id, t0),
            ("ventas", "update", keep_id, t1),  # later update wins → stays
            ("ventas", "update", drop_id, t0),
            ("ventas", "delete", drop_id, t1),  # later delete wins → goes
        ],
        EVENT_DDL,
    )
    apply_cdc_events(batch, oltp, target, propagate_deletes=True)
    fact = _fact(spark, target)
    assert fact.where(F.col("id_venta") == keep_id).count() > 0
    assert fact.where(F.col("id_venta") == drop_id).count() == 0


def test_delete_without_lineage_refuses(spark, oltp, tmp_path):
    """A star seeded WITHOUT lineage cannot route fact tombstones — the
    delete path must fail loudly, not silently skip."""
    target = str(tmp_path / "star")
    write_star(build_star(oltp, sk_mode=SK), target)  # no lineage
    batch = spark.createDataFrame([("ventas", "delete", 1, TS)], EVENT_DDL)
    with pytest.raises(ValueError, match="lineage"):
        apply_cdc_events(batch, oltp, target, propagate_deletes=True)
