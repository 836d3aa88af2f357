"""UDF / UDAF / UDTF surface — the three Python extension points.

The reference has no function registry (SURVEY §2.3); these exist to
prove the Arrow path works under the driver harness, each with an
exact DuckDB oracle:

- ``pandas_udf``     : vectorized scalar (Arrow batches, no per-row
                       Python) — word counting.
- ``applyInPandas``  : grouped UDAF — exact per-group median (a
                       whole-group computation Spark's builtin
                       aggregates only approximate via percentile).
- ``udtf``           : Python table function — token explosion with
                       positions (lateral join).

Scale posture: pandas_udf/applyInPandas stream Arrow batches
executor-side; the UDAF shuffles once on the group key. Per-row
Python UDFs (the slow path) are deliberately absent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..catalog import load_table
from ..functions import text


@pandas_udf(T.LongType())
def _word_count(s: pd.Series) -> pd.Series:
    # Vectorized over Arrow batches; input is already normalized, so
    # counting = split on single spaces (mirrors len(string_split(...))).
    return s.str.split(" ").str.len().astype("int64")


def q_udf_pandas_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{text.norm_text('text')} AS norm"
    )
    return docs.select("doc_id", _word_count("norm").alias("n_words"))


ORACLE_UDF_WORD_COUNT = r"""
SELECT doc_id,
       CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
            AS BIGINT) AS n_words
FROM documents
"""


_MEDIAN_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("median_chars", T.DoubleType()),
    ]
)


def _group_median(pdf: pd.DataFrame) -> pd.DataFrame:
    # Exact median (interpolated for even counts — same as DuckDB's
    # median() over integers).
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "median_chars": [float(pdf["n_chars"].median())],
        }
    )


def q_udaf_median_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(_group_median, _MEDIAN_SCHEMA)


ORACLE_UDAF_MEDIAN = """
SELECT lang,
       count(*) AS n_docs,
       CAST(median(n_chars) AS DOUBLE) AS median_chars
FROM documents GROUP BY lang
"""


@udtf(returnType="pos: bigint, token: string")
class _TokenExplode:
    """First five whitespace tokens with 1-based positions."""

    def eval(self, norm: str):
        for i, tok in enumerate(norm.split(" ")[:5], start=1):
            yield i, tok


def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("dfdq_token_explode", _TokenExplode)
    load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{text.norm_text('text')} AS norm"
    ).createOrReplaceTempView("docs_norm_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_norm_udtf d, LATERAL dfdq_token_explode(d.norm) t
        """
    )


ORACLE_UDTF_TOKENS = r"""
WITH wrds AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS token
FROM wrds, unnest(generate_series(1, least(5, len(w)))) AS t(i)
"""


def queries_and_oracles():
    queries = {
        "udf_pandas_word_count": q_udf_pandas_word_count,
        "udaf_median_chars": q_udaf_median_chars,
        "udtf_tokens": q_udtf_tokens,
    }
    oracles = {
        "udf_pandas_word_count": ORACLE_UDF_WORD_COUNT,
        "udaf_median_chars": ORACLE_UDAF_MEDIAN,
        "udtf_tokens": ORACLE_UDTF_TOKENS,
    }
    return queries, oracles
