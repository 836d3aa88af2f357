"""Write-path constraint enforcement: CHECK (FALSE and NULL both
violate), NOT NULL, add-constraint-scans-history, sidecar
persistence across handles, and the ALTER TABLE DDL."""

from __future__ import annotations

import pytest

from datafusion_delta_queries_spark.sources.constraints import (
    ConstrainedTable,
    ConstraintViolation,
    execute_alter_constraint,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, amt int")


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    t = ConstrainedTable(spark, path)
    t.add_check("amt_pos", "amt > 0")
    t.append(_mk(spark, [(1, "a", 10), (2, "b", 20)]))
    return t, path


def test_append_rejects_violations_atomically(spark, table):
    t, path = table
    with pytest.raises(ConstraintViolation, match="amt_pos"):
        t.append(_mk(spark, [(3, "c", 5), (4, "d", -1)]))
    # nothing from the failed batch landed
    assert t.read().count() == 2


def test_null_check_result_violates(spark, table):
    t, path = table
    # amt NULL → check evaluates NULL → violation (Delta semantics)
    with pytest.raises(ConstraintViolation, match="amt_pos"):
        t.append(_mk(spark, [(5, "e", None)]))


def test_not_null_enforced(spark, table):
    t, path = table
    t.add_not_null("v")
    with pytest.raises(ConstraintViolation, match="not_null:v"):
        t.append(_mk(spark, [(6, None, 1)]))
    t.append(_mk(spark, [(7, "g", 1)]))
    assert t.read().count() == 3


def test_add_constraint_scans_history(spark, table):
    t, path = table
    with pytest.raises(ConstraintViolation, match="amt_small"):
        t.add_check("amt_small", "amt < 15")  # k=2 has amt=20
    assert "amt_small" not in t.checks


def test_sidecar_persists_across_handles(spark, table):
    t, path = table
    t2 = ConstrainedTable(spark, path)
    assert t2.checks == {"amt_pos": "amt > 0"}
    with pytest.raises(ConstraintViolation):
        t2.append(_mk(spark, [(8, "h", 0)]))


def test_overwrite_validates_and_keeps_sidecar(spark, table):
    t, path = table
    with pytest.raises(ConstraintViolation):
        t.overwrite(_mk(spark, [(1, "a", -5)]))
    t.overwrite(_mk(spark, [(9, "i", 9)]))
    assert ConstrainedTable(spark, path).checks == {"amt_pos": "amt > 0"}
    assert t.read().count() == 1


def test_drop_constraint(spark, table):
    t, path = table
    t.drop_constraint("amt_pos")
    t.append(_mk(spark, [(10, "j", -99)]))  # contract gone
    with pytest.raises(ConstraintViolation):
        t.drop_constraint("nope")


def test_alter_table_ddl(spark, tmp_path):
    path = str(tmp_path / "ddl")
    _mk(spark, [(1, "a", 10)]).write.parquet(path)
    t = execute_alter_constraint(
        spark, "ALTER TABLE t ADD CONSTRAINT amt_pos CHECK (amt > 0)", path
    )
    assert t.checks == {"amt_pos": "amt > 0"}
    t2 = execute_alter_constraint(
        spark, "ALTER TABLE t ALTER COLUMN v SET NOT NULL", path
    )
    assert t2.not_null == ["v"]
    with pytest.raises(ConstraintViolation):
        execute_alter_constraint(
            spark,
            "ALTER TABLE t ADD CONSTRAINT bad CHECK (amt > 100)",
            path,
        )
    t3 = execute_alter_constraint(
        spark, "ALTER TABLE t DROP CONSTRAINT amt_pos", path
    )
    assert t3.checks == {}
