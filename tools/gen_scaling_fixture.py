"""Generate the sf1 SCALING slice: 50k documents + 20k embeddings.

Round-15 scaling evidence (VERDICT r14 item 5): at sf0.1 (5,000 docs)
every heavy face is dominated by fixed per-job cost, so the driver's
8-vs-32-core ratios sit at ~1 and prove nothing about scale-out.  This
generator produces a 10x documents/embeddings slice — deterministic
(numpy PCG64 seed 42), same shape as the driver fixture (word-salad
text over the same ~40-token vocabulary, ~20 sources, 5 langs,
template near-dup families at a similar rate; 64-dim clustered float
embeddings) — so the shuffle-bound faces can be measured where data
parallelism, not scheduling, is the cost.

NOT driver data: the driver's /root/testdata stays untouched and no
bench/oracle contract reads this slice; it exists only for the
committed bench_scaling_r15.json experiment (re-runnable via this
script).  Usage:

    python tools/gen_scaling_fixture.py /tmp/scaling_sf1

writes documents.parquet + embeddings.parquet + a copied region.parquet
(bench.py's warmup table) into the target directory.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
N_CLUSTERS = 16
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query a big key window row the customer table "
    "vector data join stream merge"
).split()
LANGS = ["en", "en", "en", "zh", "es", "fr", "de"]  # en-heavy like the fixture


def gen_documents(rng: np.random.Generator):
    doc_ids, texts, langs, sources = [], [], [], []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 10 and r < 0.05:
            # exact duplicate of an earlier doc
            j = int(rng.integers(0, i))
            toks = texts[j].split()
        elif i > 10 and r < 0.15:
            # near-duplicate: an earlier doc with a few token edits
            j = int(rng.integers(0, i))
            toks = texts[j].split()
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(0, len(toks)))
                toks[pos] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        else:
            n = int(rng.integers(15, 80))
            toks = [VOCAB[int(k)] for k in rng.integers(0, len(VOCAB), n)]
        doc_ids.append(i)
        texts.append(" ".join(toks))
        langs.append(LANGS[int(rng.integers(0, len(LANGS)))])
        sources.append(f"src{int(rng.integers(0, 20))}")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator):
    centers = rng.normal(0.0, 1.0, (N_CLUSTERS, DIM)).astype(np.float32)
    labels = rng.integers(0, N_CLUSTERS, N_VECS)
    vecs = centers[labels] + rng.normal(0.0, 0.35, (N_VECS, DIM)).astype(
        np.float32
    )
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32).tolist()],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([int(x) for x in labels], pa.int32()),
        }
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_sf1"
    os.makedirs(out, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(42))
    pq.write_table(gen_documents(rng), os.path.join(out, "documents.parquet"))
    pq.write_table(gen_embeddings(rng), os.path.join(out, "embeddings.parquet"))
    # bench.py warms the JVM on region.parquet; reuse the tiny driver one
    shutil.copy(
        "/root/testdata/sf0.1/region.parquet",
        os.path.join(out, "region.parquet"),
    )
    print(f"wrote {out}: {N_DOCS} docs, {N_VECS} embeddings")


if __name__ == "__main__":
    main()
