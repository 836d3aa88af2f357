"""Versioned-table sources: time travel, change feed, and the delta
compiler running over real versioned storage (SURVEY §4.3's "old
snapshot = versionAsOf, PosDeltaScan = CDF inserts")."""

from __future__ import annotations

import pytest

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.plans import (
    Filter,
    Join,
    Projection,
    Scan,
    compile_delta,
    compile_plan,
    compile_snapshot,
)
from datafusion_delta_queries_spark.sources import (
    VersionedDeltaCatalog,
    VersionedTable,
)

from .conftest import SF_SMALL


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def versioned_tables(spark, tmp_path):
    """orders/customer as 2-version tables (v0 base, v1 appends)."""
    out = {}
    for name, pred in (
        ("orders", "o_orderkey % 10 = 0"),
        ("customer", "c_custkey % 7 = 0"),
    ):
        df = load_table(spark, SF_SMALL, name)
        vt = VersionedTable(str(tmp_path / name))
        vt.write_version(df.where(f"NOT ({pred})"))
        vt.write_version(df.where(pred))
        out[name] = vt
    return out


def test_time_travel_and_changes(spark, versioned_tables):
    vt = versioned_tables["orders"]
    assert vt.versions() == [0, 1]
    full = load_table(spark, SF_SMALL, "orders")
    n_all = full.count()
    n_v0 = vt.snapshot(spark, 0).count()
    n_chg = vt.changes(spark, 0, 1).count()
    assert n_v0 + n_chg == n_all
    assert vt.snapshot(spark).count() == n_all  # latest = everything
    assert _multiset(vt.changes(spark, 0, 1)) == _multiset(
        full.where("o_orderkey % 10 = 0")
    )


def test_version_collision_refused(spark, versioned_tables):
    vt = versioned_tables["orders"]
    with pytest.raises(ValueError, match="already committed"):
        vt.write_version(vt.snapshot(spark, 0).limit(1), version=1)


def test_delta_compiler_over_versioned_storage(spark, versioned_tables):
    """full(v1) == full(v0) ∪ delta — with snapshots/changes from disk."""
    cat = VersionedDeltaCatalog(
        spark,
        versioned_tables,
        version_pins={"orders": (0, 1), "customer": (0, 1)},
    )
    ir = Projection(
        ["o_orderkey", "c_custkey", "c_name", "round(o_totalprice, 2) AS total"],
        Filter(
            "o_totalprice > 100000",
            Join(Scan("orders"), Scan("customer"), on=[("o_custkey", "c_custkey")]),
        ),
    )
    full_new = _multiset(compile_plan(ir, cat))
    full_old = _multiset(compile_snapshot(ir, cat))
    delta = _multiset(compile_delta(ir, cat))
    assert len(delta) > 0
    assert sorted(full_old + delta) == full_new


def test_unpinned_table_reads_latest_with_empty_delta(spark, versioned_tables):
    cat = VersionedDeltaCatalog(spark, versioned_tables, version_pins={})
    assert cat.delta("orders").count() == 0
    assert cat.full("orders").count() == load_table(spark, SF_SMALL, "orders").count()


def test_delta_lake_gate():
    from datafusion_delta_queries_spark.sources.versioned import delta_lake_table

    with pytest.raises(ImportError, match="delta-spark is not installed"):
        delta_lake_table(None, "/nonexistent")
