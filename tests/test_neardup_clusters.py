"""Semantics of near-dup cluster canonicalization and the ordered
funnel — the properties the oracle match alone doesn't isolate."""

from __future__ import annotations

import datetime as dt

from export_oltp_to_olap_spark.operators.neardup import neardup_clusters
from export_oltp_to_olap_spark.plans.events import funnel_stages


def test_clusters_are_transitive_and_keep_singletons(spark):
    """A-B and B-C pairs (no A-C edge) must collapse into ONE cluster
    with canonical = min id; untouched docs stay singletons."""
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 3, 0.9), (3, 1, 0.85)], "doc_a long, doc_b long, jaccard double"
    )
    got = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in neardup_clusters(docs, pairs).collect()
    }
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 4: (4, 1), 9: (9, 1)}


def test_clusters_long_chain_converges(spark):
    """A path graph needs diameter rounds — the loop must actually
    iterate, not stop after one propagation."""
    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "doc_a long, doc_b long, jaccard double"
    )
    rows = neardup_clusters(docs, pairs).collect()
    assert all(r["canonical_id"] == 0 and r["cluster_size"] == n for r in rows)


def _ev(i, user, etype, sec):
    return (i, dt.datetime(2024, 1, 1, 0, 0, sec), user, etype, 1.0, "{}")


EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_funnel_requires_stage_order(spark):
    """A click BEFORE the first view must not count as a conversion, and
    a purchase before the qualifying click must not either."""
    events = spark.createDataFrame(
        [
            # user 1: full ordered funnel
            _ev(1, 1, "view", 10), _ev(2, 1, "click", 20), _ev(3, 1, "purchase", 30),
            # user 2: click precedes the only view -> stops at view
            _ev(4, 2, "click", 5), _ev(5, 2, "view", 10),
            # user 3: purchase precedes the click -> stops at view>click
            _ev(6, 3, "view", 1), _ev(7, 3, "purchase", 2), _ev(8, 3, "click", 3),
            # user 4: never views -> not in the funnel at all
            _ev(9, 4, "click", 1), _ev(10, 4, "purchase", 2),
        ],
        EVENT_SCHEMA,
    )
    got = {r["stage"]: r["n_users"] for r in funnel_stages(events).collect()}
    assert got == {"view": 3, "view>click": 2, "view>click>purchase": 1}
