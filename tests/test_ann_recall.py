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
import pytest

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


# -- Structured-embedding fixture (r14 verdict item 4) ------------------
#
# PQ recall is near-chance on the isotropic-gaussian testdata (distance
# concentration — fixture physics, documented above), which left PQ
# approximation quality unfalsifiable. This fixture has the low-rank
# cluster structure real embeddings have, built so the SEEDED builds
# the operators use can discover it: 300 tight clusters whose
# per-subspace sub-centers are drawn from exactly _PQ_K=8 well-
# separated points, with the 8 "diagonal" composite clusters placed on
# vec_ids 0..7 (the k-means seed rows). Each cluster's composite code
# is unique, so PQ codes separate clusters perfectly and recall@5 is a
# meaningful quality gate rather than a coin flip.

_SEED = 42
_N, _D, _M, _SUB, _K = 1500, 64, 4, 16, 8
_NCLUST = 300  # 5 members each; % 50 == 0 gives 30 query points


def _structured_fixture(tmpdir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow as pa

    rng = np.random.default_rng(_SEED)
    composites = [(i,) * _M for i in range(_K)]
    seen = set(composites)
    while len(composites) < _NCLUST:
        c = tuple(int(x) for x in rng.integers(0, _K, size=_M))
        if c not in seen:
            seen.add(c)
            composites.append(c)
    # 8 well-separated sub-centers per subspace (pairwise distance
    # ~3·sqrt(2) >> the 0.05 noise scale)
    sub = rng.normal(size=(_M, _K, _SUB))
    sub *= 3.0 / np.linalg.norm(sub, axis=2, keepdims=True)
    ids = np.arange(_N, dtype=np.int64)
    cl = ids % _NCLUST
    x = np.empty((_N, _D), dtype=np.float64)
    for m in range(_M):
        idx = np.array([composites[c][m] for c in cl])
        x[:, m * _SUB : (m + 1) * _SUB] = sub[m, idx]
    x += 0.05 * rng.normal(size=x.shape)
    emb = x.astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(_N, dtype=np.int32), pa.int32()),
        }
    )
    pq.write_table(t, f"{tmpdir}/embeddings.parquet")
    # truth in float32-roundtripped doubles — exactly what the queries
    # read back from parquet
    return ids, emb.astype(np.float64)


def _l2_truth(ids: np.ndarray, m: np.ndarray, k: int = 5) -> dict[int, set]:
    qmask = ids % 50 == 0
    qids, qm = ids[qmask], m[qmask]
    d2 = (
        (qm * qm).sum(1)[:, None]
        - 2.0 * (qm @ m.T)
        + (m * m).sum(1)[None, :]
    )
    truth = {}
    for i, qid in enumerate(qids):
        s = d2[i].copy()
        s[ids == qid] = np.inf
        order = np.lexsort((ids, s))[:k]
        truth[int(qid)] = set(int(x) for x in ids[order])
    return truth


def _recall(df, truth, k: int = 5) -> float:
    got: dict[int, set] = {}
    for r in df.collect():
        got.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    return float(
        np.mean([len(got.get(q, set()) & truth[q]) / k for q in truth])
    )


@pytest.fixture(scope="module")
def structured_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("structured_emb"))
    ids, m = _structured_fixture(d)
    return d, _l2_truth(ids, m)


def test_pq_recall_floor_on_structured_fixture(spark, structured_dir):
    """PQ-ADC recall@5 gated the way IVF's is on the isotropic
    fixture: on clusterable data the 12-bit codes must place the
    same-cluster members (4 of every query's true top-5) at the top.
    A broken codebook build, a wrong ADC join, or a bad tie-break all
    collapse this toward chance (~0.003)."""
    from datafusion_delta_queries_spark.operators.llm_pipeline import (
        q_llm_embedding_pq_adc,
    )

    d, truth = structured_dir
    r = _recall(q_llm_embedding_pq_adc(spark, d), truth)
    assert r >= 0.7, r


def test_ivf_pq_recall_floor_on_structured_fixture(spark, structured_dir):
    """IVF-PQ composed recall@5 on the same fixture: the IVF probe
    (4/16 cells) adds probe-miss loss on top of PQ code loss, so the
    floor sits below the pure-PQ gate but far above chance."""
    from datafusion_delta_queries_spark.operators.llm_pipeline import (
        q_llm_embedding_ivf_pq,
    )

    d, truth = structured_dir
    r = _recall(q_llm_embedding_ivf_pq(spark, d), truth)
    assert r >= 0.5, r
