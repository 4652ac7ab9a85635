"""CSV/JSONL round-trips, schema enforcement, corrupt-row isolation."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from export_oltp_to_olap_spark.sources import formats
from export_oltp_to_olap_spark.sources.parquet import load_tables

SRC = "/root/testdata/sf0.001"

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, tmp_path):
    nation = load_tables(spark, SRC, ("nation",))["nation"].select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_csv")
    formats.write_csv(nation, path)
    back = formats.read_csv(spark, path, NATION_SCHEMA)
    valid, invalid = formats.split_corrupt(back)
    assert invalid.count() == 0
    assert _rows(valid) == _rows(nation)


def test_jsonl_roundtrip(spark, tmp_path):
    nation = load_tables(spark, SRC, ("nation",))["nation"].select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_jsonl")
    formats.write_jsonl(nation, path)
    back = formats.read_jsonl(spark, path, NATION_SCHEMA)
    valid, invalid = formats.split_corrupt(back)
    assert invalid.count() == 0
    assert _rows(valid) == _rows(nation)


def test_corrupt_rows_isolated_not_fatal(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"n_nationkey": 1, "n_name": "A", "n_regionkey": 0}\n'
        "this is not json\n"
        '{"n_nationkey": "NOT_AN_INT_OBJ", "n_name": {"x": 1}, "n_regionkey": 0}\n'
    )
    back = formats.read_jsonl(spark, str(p), NATION_SCHEMA)
    valid, invalid = formats.split_corrupt(back)
    assert valid.count() == 1
    assert invalid.count() == 2
    assert valid.columns == NATION_SCHEMA.fieldNames()


def test_parquet_lake_partitioning(spark, tmp_path):
    orders = load_tables(spark, SRC, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_lake")
    formats.to_parquet_lake(orders, path, partition_by=["o_year"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: a year filter must prune to the matching directory
    plan = (
        back.where(F.col("o_year") == 1995)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(o_year" in plan or "o_year#" in plan

def test_orc_roundtrip_preserves_values_and_prunes(spark, sf0001, tmp_path):
    """ORC is the third lake interchange format next to CSV/JSONL: a
    write→read round trip must preserve values and schema exactly, and
    the reader must push filters/prune columns like the parquet path
    (spot-checked via the scan's ReadSchema)."""
    from export_oltp_to_olap_spark.sources.formats import read_orc, write_orc

    src = spark.read.parquet(f"{sf0001}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    pruned = back.select("o_orderkey").where(back.o_orderkey == 1)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "o_orderkey" in plan and "o_totalprice" not in plan.split("ReadSchema")[1][:200]
