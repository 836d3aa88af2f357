"""Non-UTC session-timezone parity for the timestamp-bearing families.

The driver imports `__spark_entry__` into ITS OWN session, whose
timezone is whatever the host defaults to — nothing guarantees UTC.
DuckDB oracles are timezone-agnostic (NTZ arithmetic), so any query
whose Spark result depends on `spark.sql.session.timeZone` is a
latent driver mismatch. The events loader's ltz/ntz handling caught a
real bug this way once (verify-skill history); this file makes the
probe a standing regression gate for one representative per
timestamp-bearing family instead of a manual check.
"""

from __future__ import annotations

import pytest

from datafusion_delta_queries_spark.operators import registry
from datafusion_delta_queries_spark.oracle import compare, run_oracle

from .conftest import SF_SMALL

QUERIES, ORACLES = registry()

# one representative per timestamp-bearing family
TZ_SENSITIVE = [
    "events_sessionize",        # raw event timestamps + gap logic
    "events_dedup_latest",      # max-ts dedup
    "scd2_point_in_time",       # interval-validity join
    "signed_sessionize_maintenance",  # signed net over session bounds
    "signed_sessionize_stored",       # ts roundtrip through parquet state
    "sql_time_travel",          # version-pinned reads
]


@pytest.mark.parametrize(
    "name", [n for n in TZ_SENSITIVE if n in set(QUERIES) & set(ORACLES)]
)
def test_matches_oracle_under_non_utc_session(spark, name):
    tz_key = "spark.sql.session.timeZone"
    old_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "America/New_York")
    try:
        df = QUERIES[name](spark, SF_SMALL)
        ok, msg = compare(df, run_oracle(ORACLES[name], SF_SMALL))
        assert ok, f"{name} under America/New_York: {msg}"
    finally:
        spark.conf.set(tz_key, old_tz)


def test_all_tz_sensitive_names_resolve():
    missing = [n for n in TZ_SENSITIVE if n not in QUERIES]
    assert not missing, missing
