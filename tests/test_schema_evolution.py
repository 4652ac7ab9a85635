"""Schema evolution on the lake: batches written under different
schema versions read as one frame (union schema, NULL backfill), and
the drift report surfaces partial columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from export_oltp_to_olap_spark.sources.evolution import (
    read_evolved_parquet,
    schema_drift_report,
)


def _write_batches(spark, tmp_path):
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(3, "gamma", 0.9), (4, "delta", 0.2)],
        "doc_id long, text string, quality double",
    )
    v1.write.parquet(str(tmp_path / "b1"))
    v2.write.parquet(str(tmp_path / "b2"))
    return str(tmp_path / "b1"), str(tmp_path / "b2")


def test_union_schema_with_null_backfill(spark, tmp_path):
    p1, p2 = _write_batches(spark, tmp_path)
    df = read_evolved_parquet(spark, p1, p2)
    assert set(df.columns) == {"doc_id", "text", "quality"}
    rows = {r.doc_id: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[1].quality is None and rows[3].quality == 0.9
    # old-schema batches are readable THROUGH the new schema unchanged
    assert rows[2].text == "beta"


def test_drift_report_flags_partial_columns(spark, tmp_path):
    p1, p2 = _write_batches(spark, tmp_path)
    rep = {r.column: r for r in schema_drift_report(spark, p1, p2).collect()}
    assert rep["doc_id"].present_millionths == 1_000_000
    assert rep["quality"].n_present == 2 and rep["quality"].n_rows == 4
    assert rep["quality"].present_millionths == 500_000
    assert rep["quality"].dtype == "double"


def test_compaction_unifies_file_schemas(spark, tmp_path):
    """After compact_to_union_schema the lake reads the SAME rows with
    the union schema WITHOUT mergeSchema — the per-file footers are
    uniform, so plain reads (and engines without schema merging) see
    every column."""
    import pyarrow.parquet as pq
    from export_oltp_to_olap_spark.sources.evolution import (
        compact_to_union_schema,
    )

    p1, p2 = _write_batches(spark, tmp_path)
    out = str(tmp_path / "compacted")
    n = compact_to_union_schema(spark, out, p1, p2, target_files=2)
    assert n == 4
    plain = spark.read.parquet(out)  # NO mergeSchema
    assert set(plain.columns) == {"doc_id", "text", "quality"}
    rows = {r.doc_id: r for r in plain.collect()}
    assert rows[1].quality is None and rows[3].quality == 0.9
    # every physical file carries the full union schema
    import glob
    for f in glob.glob(f"{out}/*.parquet"):
        assert set(pq.read_schema(f).names) == {"doc_id", "text", "quality"}
