"""DuckDB oracle comparison harness.

Replicates the driver's correctness gate locally: run the Spark query
and the oracle SQL over the same parquet tables, then compare
row-count + column names + order-insensitive values. Used by
tests/test_oracle_parity.py at sf0.001 so mismatches surface before the
driver's sf0.01 run.
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb
import pandas as pd

from .catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = table_path(sf_dir, t)
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def _norm_value(v):
    """Engine-neutral canonical form of one cell."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        # 12 significant digits: money sums with cents survive up to
        # ~1e10 (the driver compares at sf0.01 where sums reach ~1e8;
        # %.10g silently dropped their cents and under-tested).
        return f"{v:.12g}"
    if isinstance(v, Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if pd.isna(v):
            return "NULL"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if pd.isna(v):
        return "NULL"
    if isinstance(v, (int,)):
        return str(int(v))
    return str(v)


def normalize_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def dtype_mismatches(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Integer-vs-float column dtype skew the driver's value-hash rejects.

    The driver stringifies raw cell values, so a Spark int64 ``1355``
    against an oracle float64 ``1355.0`` hash-mismatches even though
    ``_norm_value`` collapses them locally (this was the single red row
    in CORRECTNESS_r03: DuckDB ``sum(BIGINT)`` returns HUGEINT, which
    pandas widens to float64). Flag int-vs-float pairs — unless the
    float side carries NaN, in which case the widening is null-induced
    (Spark's own ``toPandas`` does it too) and not an oracle bug.
    """
    msgs = []
    for c in sorted(spark_pdf.columns):
        sk, ok_ = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
        int_kinds = ("i", "u")
        if sk in int_kinds and ok_ == "f" and not oracle_pdf[c].isna().any():
            msgs.append(
                f"column {c!r}: spark is {spark_pdf[c].dtype} but oracle is "
                f"{oracle_pdf[c].dtype} with no NULLs — cast the oracle "
                "aggregate (e.g. CAST(sum(...) AS BIGINT)); the driver's "
                "value-hash treats 1 and 1.0 as different"
            )
        elif sk == "f" and ok_ in int_kinds and not spark_pdf[c].isna().any():
            msgs.append(
                f"column {c!r}: spark is {spark_pdf[c].dtype} but oracle is "
                f"{oracle_pdf[c].dtype} — cast one side so both emit the "
                "same numeric family"
            )
    return msgs


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    """Compare a Spark DataFrame with an oracle pandas frame.

    Returns (ok, message). Mirrors the driver: column-name set, row
    count, then order-insensitive canonical values — plus a
    dtype-strict check the driver implies but our value normalization
    would otherwise mask (int-vs-float hash skew).
    """
    spark_pdf = spark_df.toPandas()
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    skew = dtype_mismatches(spark_pdf, oracle_pdf)
    if skew:
        return False, "dtype skew (driver hash would fail):\n  " + "\n  ".join(skew)
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    s_rows = normalize_frame(spark_pdf)
    o_rows = normalize_frame(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            f"  row {i}: spark={s} oracle={o}"
            for i, (s, o) in enumerate(zip(s_rows, o_rows))
            if s != o
        ][:5]
        return False, "value mismatch (cols sorted: %s):\n%s" % (s_cols, "\n".join(diffs))
    return True, f"ok ({len(s_rows)} rows)"
