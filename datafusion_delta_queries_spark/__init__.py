"""PySpark-native analytics engine with the capabilities of
JanKaul/datafusion-delta-queries (incremental view maintenance via
positive-delta query rewriting), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession builder tuned for local[N] testing and
                   cluster-scale defaults (AQE, UTC, Arrow).
- ``catalog``    : parquet table loading / temp-view registration.
- ``plans``      : the Python logical IR mirroring the reference's node
                   set (Scan/Projection/Filter/Join/CrossJoin/Union/
                   PosDelta/PosDeltaScan), the ``rewrite_pos_delta``
                   pass, and the full/delta compilers to DataFrames.
- ``operators``  : the batch relational query surface (thin,
                   alias-stable wrappers over Spark SQL / DataFrame API).
- ``sources``    : versioned parquet tables (time travel + insert-only
                   change feed) feeding the delta compiler; real Delta
                   Lake import-gated behind the same two primitives.
- ``functions``  : LLM-data-pipeline functions: text analysis, dedup
                   (exact/MinHash/SimHash/ngram-Jaccard), embedding
                   similarity, multimodal column plumbing.
- ``streaming``  : Structured Streaming realization of the delta
                   machinery (Spark's IncrementalExecution *is* the
                   PosDelta rule for select/filter/union).

Reference parity: see SURVEY.md; reference files cited per-module as
/root/reference/src/... (file:line).
"""

__version__ = "0.1.0"
