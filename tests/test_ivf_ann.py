"""IVF ANN: recall + pruning properties (no SQL oracle — the index is
approximate by design, so the gate is recall against the in-repo exact
brute force, plus proof that probing actually prunes the search)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.functions.similarity import (
    as_double_array,
    dot,
    ivf_index,
    ivf_search,
    norm,
)

from .conftest import SF_SMALL

K, N_QUERIES = 10, 20


def _brute_force_topk(spark, corpus, queries):
    sim = f"{dot('q', 'v')} / (({norm('q')}) * ({norm('v')}))"
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    return (
        queries.crossJoin(corpus)
        .selectExpr("q_id", "vec_id", f"{sim} AS sim")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= K)
    )


def test_ivf_recall_and_pruning(spark):
    vecs = load_table(spark, SF_SMALL, "embeddings")
    indexed, centroids = ivf_index(vecs, n_cells=16)
    queries = (
        vecs.orderBy("vec_id")
        .limit(N_QUERIES)
        .selectExpr("vec_id AS q_id", "embedding AS q_vec")
    )
    approx = ivf_search(indexed, centroids, queries, k=K, n_probe=4)

    corpus = vecs.selectExpr("vec_id", f"{as_double_array('embedding')} AS v")
    exact = _brute_force_topk(
        spark, corpus, queries.selectExpr("q_id", f"{as_double_array('q_vec')} AS q")
    )
    hits = approx.select("q_id", "vec_id").intersect(exact.select("q_id", "vec_id"))
    recall = hits.count() / (N_QUERIES * K)
    assert recall >= 0.6, f"IVF recall@{K} too low: {recall:.2f}"

    # Pruning is real: with 16 cells / 4 probes, each query must scan
    # well under the full corpus.
    n_corpus = vecs.count()
    scanned = (
        ivf_search(indexed, centroids, queries, k=10**9, n_probe=4)
        .groupBy("q_id")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert scanned < 0.6 * n_corpus, f"probe scanned {scanned}/{n_corpus}"

    # Determinism: same build twice → identical assignments.
    indexed2, _ = ivf_index(vecs, n_cells=16)
    assert indexed.select("vec_id", "cell").exceptAll(
        indexed2.select("vec_id", "cell")
    ).count() == 0


def test_co_materialize_preserves_order_and_results(spark):
    """_co_materialize (the r17 concurrent-job overlap for the PQ
    subspace builds) must return each thunk's result in ARGUMENT
    order regardless of completion order, and the checkpointed frames
    must hold exactly the rows the serial path would."""
    from datafusion_delta_queries_spark.operators.llm_pipeline import (
        _co_materialize,
    )

    def make(i: int):
        # deliberately varied sizes so completion order != argument order
        return lambda: spark.range(i * 100 + 1).withColumn(
            "tag", F.lit(i)
        ).localCheckpoint(eager=True)

    frames = _co_materialize(*[make(i) for i in range(4)])
    for i, df in enumerate(frames):
        assert df.count() == i * 100 + 1
        tags = df.select("tag").distinct().collect()
        assert [r["tag"] for r in tags] == [i]
