"""Every registered query must run (plan + execute) on EMPTY inputs.

A pipeline stage that crashes on a zero-row partition day — an empty
CDC batch, a source that produced nothing overnight, a filter that
matched nothing — takes the whole job down.  This gate materializes a
zero-row copy of every fixture table (same schemas) and drives each
registered query over it: the result may be empty, but planning and
execution must succeed and the schema must be stable.

Known principled exception: quantizer TRAINING (`quality_classifier_scores`;
also `ivf_cosine_topk`/`pq_cosine_topk` when called with their training
paths rather than the registered frozen-artifact faces) REQUIRES a
non-empty training sample — FAISS raises on empty training sets too.
Those must fail with a clear error, not a shapeless crash; asserted
separately.  The registered PQ faces freeze their quantizers to the
committed artifact, so they survive empty inputs like everything else.
"""

from __future__ import annotations

import os

import pytest

from export_oltp_to_olap_spark import registry
from export_oltp_to_olap_spark.sources.parquet import load_tables

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Queries whose semantics genuinely require non-empty input (quantizer /
# classifier training); everything else must succeed on empty tables.
_NEEDS_DATA = {"quality_classifier_scores"}

registry._ensure_loaded()


pytestmark = pytest.mark.slow  # streaming/robustness sweep tier (see pytest.ini)


@pytest.fixture(scope="module")
def empty_sf(spark, sf001, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = load_tables(spark, sf001, (t,))[t]
        df.limit(0).write.mode("overwrite").parquet(os.path.join(str(root), f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize(
    "name", sorted(set(registry.queries()) - _NEEDS_DATA)
)
def test_query_survives_empty_inputs(spark, empty_sf, name):
    fn = registry.REGISTRY[name].fn
    df = fn(spark, empty_sf)
    rows = df.collect()  # must execute, not just plan
    assert df.columns, f"{name}: schema collapsed on empty input"
    assert rows == [] or rows, f"{name}: collect failed"


@pytest.mark.parametrize("name", sorted(_NEEDS_DATA))
def test_quantizer_queries_fail_clearly_on_empty(spark, empty_sf, name):
    fn = registry.REGISTRY[name].fn
    with pytest.raises(Exception) as exc:
        fn(spark, empty_sf).collect()
    # a clear, intentional error (empty sample / no centroids), not an
    # internal Py4J shape error propagated from deep inside numpy
    msg = str(exc.value).lower()
    assert any(k in msg for k in ("empty", "sample", "no rows", "centroid", "zero")), (
        f"{name} failed on empty input with an unclear error: {msg[:200]}"
    )
