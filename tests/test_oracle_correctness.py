"""Differential test: every registered query vs its DuckDB oracle at
sf0.01 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from export_oltp_to_olap_spark import registry
from tests.oracle_harness import compare_query_to_oracle

registry._ensure_loaded()
_CASES = [
    (name, reg) for name, reg in sorted(registry.REGISTRY.items()) if reg.sql is not None
]


@pytest.mark.parametrize("name,reg", _CASES, ids=[n for n, _ in _CASES])
def test_query_matches_oracle(spark, sf001, name, reg):
    compare_query_to_oracle(spark, sf001, reg.fn, reg.sql)


def test_every_query_runs_and_every_oracle_key_exists(spark, sf001):
    qs = registry.queries()
    oracles = registry.oracle_sql()
    assert qs, "no queries registered"
    for k in oracles:
        assert k in qs, f"oracle {k} has no query"


def test_no_oracle_queries_run_and_are_driver_serializable(spark, sf001):
    """Every registered query WITHOUT an oracle must still execute and
    produce values the driver's rows-only check can record.  Round 1:
    ``media_frame_sample`` was registered but returned raw binary and
    silently produced no CORRECTNESS row — this guard makes that class of
    drop a pytest failure instead."""
    qs = registry.queries()
    oracles = registry.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, sf001)
        rows = df.collect()
        assert rows, f"{name} returned no rows at sf0.001"
        for r in rows[:10]:
            for col, v in zip(df.columns, r):
                assert not isinstance(v, (bytes, bytearray)), (
                    f"{name}.{col} returns raw binary — the driver check "
                    f"cannot hash it; digest it instead"
                )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["region", "nation", "anio", "mes", "revenue", "n_lines", "n_orders"]
