"""Skew mitigation: salted two-phase aggregation.

A groupBy on a handful of hot keys (returnflag, country, event_type…)
funnels each key's entire volume through one reducer. Salting splits
every hot key into ``n_salts`` sub-keys for a parallel partial pass,
then combines partials in a second (tiny) aggregation. Correct for any
associative/commutative aggregate (sum/count/min/max).

The salt must be deterministic per row (derived from an existing
column, never rand()) so re-runs and retried tasks produce identical
partials. AQE's skew-join handling covers *joins*; this pattern covers
skewed *aggregations*, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str, n_salts: int = 16) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from an existing column."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(from_col), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` combine the
    partials per keys (e.g. partial sum → final sum of sums).
    """
    salted = with_salt(df, salt_from, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side.

    A hot join key funnels its whole fact volume through one task.
    Salting splits each fact key into ``n_salts`` deterministic
    sub-keys; the (smaller) dim side is replicated once per salt so
    every sub-key finds its match. Row-for-row identical to the plain
    join — the replication factor costs n_salts × |dim|, so use it
    when |dim| ≪ |fact| and AQE's skew splitting can't apply (e.g.
    the skewed side feeds a co-grouped downstream op that must keep
    its partitioning).
    """
    fact_s = with_salt(fact, salt_from, n_salts)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_s.join(
        dim_s,
        (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["_salt"] == dim_s["_salt"]),
    )
    return out.drop("_salt")
