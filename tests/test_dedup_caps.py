"""Hot-key guards in the dedup candidate generators.

One ultra-hot shingle (boilerplate) or one degenerate LSH band bucket
must not quadratically explode candidate pairs / wedge a single task —
the caps drop them, and only them.
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators.llm_pipeline import (
    _lsh_candidates,
    _ngram_candidates,
)

from .conftest import SF_SMALL


def test_hot_shingle_df_cap_bounds_candidates(spark):
    rows = [(i, "the quick fox") for i in range(30)]  # hot: df=30
    rows += [(0, "rare pair x"), (1, "rare pair x")]  # cold: df=2
    ex = spark.createDataFrame(rows, "doc_id: bigint, shingle: string")

    capped = _ngram_candidates(ex, df_cap=10).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(0, 1)}

    uncapped = _ngram_candidates(ex, df_cap=10**6).count()
    assert uncapped == 30 * 29 // 2  # quadratic without the guard


def test_lsh_bucket_cap_drops_degenerate_band(spark):
    # 20 identical shingle sets -> identical signatures -> every band
    # bucket holds all 20 docs.
    sh = spark.createDataFrame(
        [(i, ["aa bb cc", "bb cc dd", "cc dd ee"]) for i in range(20)],
        "doc_id: bigint, sh: array<string>",
    )
    assert _lsh_candidates(sh, bucket_cap=10).count() == 0
    assert _lsh_candidates(sh, bucket_cap=256).count() == 20 * 19 // 2


def test_tfidf_corpus_size_is_inside_the_lazy_plan(spark):
    """N must ride the plan as a broadcast scalar aggregate, not an
    eager driver-side .count() whose result is burned into the query
    text (the build-time corpus scan the advisory flagged).

    Note spark.read.parquet itself fires a footer-read job, so "zero
    jobs at build time" is unachievable; the pin is that the optimized
    plan still contains the n_docs_total aggregate."""
    from datafusion_delta_queries_spark.operators.llm_pipeline import (
        q_llm_tfidf_top_terms,
    )

    df = q_llm_tfidf_top_terms(spark, SF_SMALL)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "n_docs_total" in plan


def test_semdedup_scaled_k_regime_matches_oracle(spark):
    """SemDeDup's production regime — k grows with the corpus so
    cluster size stays bounded — is executable via the parameterized
    ledger, and stays oracle-exact at a non-fixture k. Also pins the
    economics claim: larger k means strictly more clusters, so
    per-cluster pair volume shrinks."""
    import duckdb

    from datafusion_delta_queries_spark.operators.curation import (
        _oracle_dedup_semantic,
        _semdedup_ledger,
    )

    sf = "/root/testdata/sf0.001"
    got = _semdedup_ledger(spark, sf, k=80).orderBy("cluster_id")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = con.sql(
        _oracle_dedup_semantic(80) + " ORDER BY cluster_id"
    ).fetchall()
    rows = [tuple(r) for r in got.collect()]
    assert rows == [tuple(w) for w in want]
    assert len(rows) == 80  # every seed formed a cluster at this k
    # bounded-cluster economics: max cluster size shrinks vs k=8
    k8_max = max(
        r["n_vecs"] for r in _semdedup_ledger(spark, sf, k=8).collect()
    )
    assert max(r[1] for r in rows) < k8_max


def test_prefix_filter_shrinks_candidates_yet_stays_complete(spark):
    """Prefix filtering must generate strictly fewer candidate pairs
    than the uncapped shared-shingle join while finding the SAME
    qualifying pairs (the oracle already proves completeness; this
    pins the candidate-volume claim the technique exists for)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from datafusion_delta_queries_spark.operators.llm_pipeline import (
        _PREFIX_T_DEN,
        _PREFIX_T_NUM,
        _docs_shingled,
    )
    from .conftest import SF_SMALL

    sh = _docs_shingled(spark, SF_SMALL)
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    brute = (
        ex.selectExpr("doc_id AS a", "shingle")
        .join(ex.selectExpr("doc_id AS b", "shingle"), "shingle")
        .where("a < b")
        .select("a", "b")
        .distinct()
        .count()
    )
    dfc = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        "df", F.md5("shingle"), "shingle"
    )
    prefix = (
        ex.join(dfc, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sh.selectExpr("doc_id", "size(sh) AS n"), "doc_id")
        .where(
            f"rn <= n - ((({_PREFIX_T_NUM} * n) + {_PREFIX_T_DEN - 1}) "
            f"DIV {_PREFIX_T_DEN}) + 1"
        )
    )
    pref = (
        prefix.selectExpr("doc_id AS a", "shingle")
        .join(prefix.selectExpr("doc_id AS b", "shingle"), "shingle")
        .where("a < b")
        .select("a", "b")
        .distinct()
        .count()
    )
    assert 0 < pref < brute, (pref, brute)
