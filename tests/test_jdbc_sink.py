"""Contract tests for the Postgres upsert sink (sources/jdbc.py) with a
fake DBAPI — no live database (VERDICT r2 item 2).

The reference's write path is row-at-a-time ``INSERT ... ON CONFLICT DO
UPDATE`` (ref sync_oltp_to_olap.py:56-93); the sink batches the same
statement.  These tests pin the three contract points: the statement
text, batch flushing at ``batch_size``, and LWW pre-dedup so one
statement never carries two rows of the same key (Postgres would raise
"cannot affect row a second time").
"""

from __future__ import annotations

import json
import os
import sys
import types
import uuid

from export_oltp_to_olap_spark.sources.jdbc import (
    JdbcConfig,
    _pg_upsert_partition,
    upsert_postgres,
)

CFG = JdbcConfig(url="jdbc:postgresql://db.example:5433/olap", user="u", password="p")


class _FakeCursor:
    def __init__(self, log):
        self.log = log

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakeConn:
    def __init__(self, log, kwargs):
        self.log = log
        self.kwargs = kwargs
        self.committed = False
        self.closed = False

    def cursor(self):
        return _FakeCursor(self.log)

    def commit(self):
        self.committed = True

    def close(self):
        self.closed = True


def _install_fake_psycopg2(monkeypatch):
    """A recording psycopg2 stand-in (public DBAPI surface only)."""
    log = {"connects": [], "execute_values": []}
    pg = types.ModuleType("psycopg2")
    extras = types.ModuleType("psycopg2.extras")

    def connect(**kwargs):
        conn = _FakeConn(log, kwargs)
        log["connects"].append(conn)
        return conn

    def execute_values(cur, sql, batch):
        log["execute_values"].append((sql, list(batch)))

    pg.connect = connect
    pg.extras = extras
    extras.execute_values = execute_values
    monkeypatch.setitem(sys.modules, "psycopg2", pg)
    monkeypatch.setitem(sys.modules, "psycopg2.extras", extras)
    return log


def test_partition_writer_statement_and_batching(monkeypatch):
    log = _install_fake_psycopg2(monkeypatch)
    rows = [{"k": i, "v": f"v{i}", "ver": i * 10} for i in range(5)]
    _pg_upsert_partition(
        iter(rows), CFG, "hecho_ventas", ["k", "v", "ver"], ["k"], batch_size=2
    )

    conn = log["connects"][0]
    assert conn.kwargs == {
        "host": "db.example",
        "port": "5433",
        "dbname": "olap",
        "user": "u",
        "password": "p",
    }
    assert conn.committed and conn.closed

    sqls = {sql for sql, _ in log["execute_values"]}
    assert sqls == {
        "INSERT INTO hecho_ventas (k, v, ver) VALUES %s "
        "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v, ver = EXCLUDED.ver"
    }
    batches = [b for _, b in log["execute_values"]]
    assert [len(b) for b in batches] == [2, 2, 1]  # flush at batch_size, then tail
    assert [t for b in batches for t in b] == [(i, f"v{i}", i * 10) for i in range(5)]


def test_partition_writer_composite_key_excludes_keys_from_update(monkeypatch):
    log = _install_fake_psycopg2(monkeypatch)
    _pg_upsert_partition(
        iter([{"a": 1, "b": 2, "v": "x"}]), CFG, "t", ["a", "b", "v"], ["a", "b"], 10
    )
    sql, batch = log["execute_values"][0]
    assert "ON CONFLICT (a, b) DO UPDATE SET v = EXCLUDED.v" in sql
    assert "EXCLUDED.a" not in sql and "EXCLUDED.b" not in sql
    assert batch == [(1, 2, "x")]


def test_upsert_postgres_lww_prededup(spark, tmp_path):
    """upsert_postgres must hand the writer at most ONE row per key, the
    tiebreak winner — executor-side capture via a file-writing double
    (sys.modules patches don't reach Python workers)."""
    out_dir = str(tmp_path / "captured")
    os.makedirs(out_dir)

    def capture_writer(rows, cfg, table, columns, key_columns, batch_size):
        assert table == "t" and key_columns == ["k"] and batch_size == 7
        path = os.path.join(out_dir, f"{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write(json.dumps([row[c] for c in columns]) + "\n")

    df = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "only", 1), (3, "a", 5), (3, "b", 3)],
        "k long, v string, ver long",
    )
    upsert_postgres(
        df, CFG, "t", ["k"], batch_size=7, tiebreak=["ver"], partition_writer=capture_writer
    )

    got = []
    for fname in os.listdir(out_dir):
        with open(os.path.join(out_dir, fname), encoding="utf-8") as fh:
            got += [tuple(json.loads(line)) for line in fh]
    assert sorted(got) == [(1, "new", 2), (2, "only", 1), (3, "a", 5)]
