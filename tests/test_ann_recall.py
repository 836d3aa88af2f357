"""Honest approximation-quality measurement for the ANN family.

Correctness of these indexes is oracle-EXACT (the builds are seeded
and integer-quantized, so DuckDB reproduces them bit-for-bit); this
file measures the other axis — how good the approximation is — and
pins the number where the fixture physics allow a meaningful floor.

On the synthetic ISOTROPIC-GAUSSIAN embeddings, pairwise distances
concentrate in 64-d, so code-based compression (PQ: 4 subspaces × 8
codes = 12 bits/vector) cannot preserve neighbor contrast — measured
recall@5 ≈ 0.06 (near chance), a property of the DATA, not the
operator: PQ earns its keep on real embeddings with low-dimensional
structure. IVF scores RAW vectors inside probed cells, so its only
loss is probe misses — measured ≈ 0.68 at n_probe/n_cells = 4/16 —
and that number is stable enough to gate."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from datafusion_delta_queries_spark.operators.llm_pipeline import (
    q_llm_embedding_ivf,
)

from .conftest import SF_SMALL


def test_ivf_recall_floor(spark):
    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    m = np.array(list(t["embedding"]), dtype=np.float64)
    qmask = ids % 50 == 0
    qids, qm = ids[qmask], m[qmask]
    norms = np.linalg.norm(m, axis=1)
    qn = np.linalg.norm(qm, axis=1)
    cos = (qm @ m.T) / np.outer(qn, norms)
    truth = {}
    for i, qid in enumerate(qids):
        s = cos[i].copy()
        s[ids == qid] = -np.inf
        order = np.lexsort((ids, -s))[:5]
        truth[qid] = set(ids[order])
    got: dict[int, set] = {}
    for r in q_llm_embedding_ivf(spark, SF_SMALL).collect():
        got.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    recall = np.mean(
        [len(got.get(q, set()) & truth[q]) / 5 for q in truth]
    )
    # measured 0.68 on the fixture; 0.5 floor = probe quality must not
    # silently regress (a wrong probe rule or broken centroid build
    # lands near 4/16 = 0.25)
    assert recall >= 0.5, recall
