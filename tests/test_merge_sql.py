"""MERGE INTO: Delta DML semantics — first-match-wins clause routing,
the multiple-source-match error, staged-swap safety."""

from __future__ import annotations

import pytest

from datafusion_delta_queries_spark.plans.merge_sql import (
    execute_merge,
    parse_merge,
)
from datafusion_delta_queries_spark.plans.sql_frontend import UnsupportedSQL


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k: int, v: string, amt: int")


def _state(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


@pytest.fixture()
def target(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]).write.parquet(path)
    return path


def test_merge_update_delete_insert(spark, target):
    """One statement exercising every clause kind: k=1 deleted (first
    clause wins), k=2 updated from the source, k=3 untouched (matched
    by no clause condition path: passes through unchanged via the
    update's residual), k=9 inserted."""
    src = _mk(spark, [(1, "x", 0), (2, "y", 99), (9, "z", 90)])
    execute_merge(
        spark,
        """
        MERGE INTO t USING s ON t.k = s.k
        WHEN MATCHED AND s.amt = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt + 1
        WHEN NOT MATCHED THEN INSERT *
        """,
        target,
        src,
    )
    assert _state(spark, target) == [
        (2, "y", 100),
        (3, "c", 30),
        (9, "z", 90),
    ]


def test_merge_first_match_wins_and_passthrough(spark, target):
    """A matched row hitting the FIRST clause never reaches the
    second; a matched row hitting neither passes through unchanged."""
    src = _mk(spark, [(1, "p", 100), (2, "q", 5)])
    execute_merge(
        spark,
        """
        MERGE INTO t USING s ON t.k = s.k
        WHEN MATCHED AND s.amt > 50 THEN UPDATE SET v = 'big'
        WHEN MATCHED AND s.amt > 50 THEN DELETE
        WHEN MATCHED AND s.amt < 0 THEN DELETE
        """,
        target,
        src,
    )
    # k=1: first clause (update) wins; k=2 matched but no clause → kept
    assert _state(spark, target) == [
        (1, "big", 10),
        (2, "b", 20),
        (3, "c", 30),
    ]


def test_merge_insert_columns_with_null_fill(spark, target):
    src = _mk(spark, [(7, "n", 70)])
    execute_merge(
        spark,
        """
        MERGE INTO t USING s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k, amt) VALUES (s.k, s.amt * 2)
        """,
        target,
        src,
    )
    assert (7, None, 140) in _state(spark, target)


def test_merge_multiple_source_matches_refused(spark, target):
    src = _mk(spark, [(1, "x", 1), (1, "y", 2)])
    before = _state(spark, target)
    with pytest.raises(ValueError, match="multiple source rows"):
        execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v",
            target,
            src,
        )
    assert _state(spark, target) == before  # untouched on failure


def test_merge_guards(spark, target):
    src = _mk(spark, [(9, "z", 9)])
    with pytest.raises(UnsupportedSQL, match="unknown columns"):
        execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET nope = 1",
            target,
            src,
        )
    with pytest.raises(UnsupportedSQL, match="WHEN clause"):
        parse_merge("MERGE INTO t USING s ON t.k = s.k")
    with pytest.raises(UnsupportedSQL, match="ON condition"):
        parse_merge("MERGE INTO t USING s ON WHEN MATCHED THEN DELETE")
    spec = parse_merge(
        "MERGE INTO a.t AS x USING b.s AS y ON x.k = y.k "
        "WHEN MATCHED THEN DELETE"
    )
    assert (spec["target"], spec["t_alias"]) == ("t", "x")
    assert (spec["source"], spec["s_alias"]) == ("s", "y")
