"""Continuous aggregate table: stored state == full recompute across
multiple refresh cycles (the end-to-end loop behind the reference's
IVM idea — maintain, persist via keyed upsert, refresh from the next
delta batch without rescanning history)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.operators.continuous_agg import (
    ContinuousAggregate,
)
from datafusion_delta_queries_spark.plans import UnsupportedSQL

from .conftest import SF_SMALL

SQL = (
    "SELECT o_orderpriority, count(*) AS n_orders, "
    "min(o_totalprice) AS min_price, max(o_totalprice) AS max_price, "
    "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents, "
    "avg(o_totalprice) AS mean_price "
    "FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderpriority"
)


def _recompute(df):
    return (
        df.where("o_totalprice > 1000")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).alias("cents"),
            F.avg("o_totalprice").alias("mean_price"),
        )
    )


def _rows(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[d.pop("o_orderpriority")] = d
    return out


def _assert_state_equals(view, expected_df):
    got, exp = _rows(view.read()), _rows(_recompute(expected_df))
    assert set(got) == set(exp)
    for k in exp:
        for c in ("n_orders", "min_price", "max_price", "cents"):
            assert got[k][c] == exp[k][c], (k, c)
        assert abs(got[k]["mean_price"] - exp[k]["mean_price"]) < 1e-6, k


def test_refresh_cycles_equal_full_recompute(spark, tmp_path):
    """initialize + two refresh cycles: after each cycle the stored
    table equals the batch recompute over everything seen so far."""
    orders = load_table(spark, SF_SMALL, "orders")
    base = orders.where("o_orderkey % 3 = 0")
    b1 = orders.where("o_orderkey % 3 = 1")
    b2 = orders.where("o_orderkey % 3 = 2")

    view = ContinuousAggregate(spark, str(tmp_path / "state"), SQL)
    view.initialize(base)
    _assert_state_equals(view, base)

    view.refresh(b1)
    _assert_state_equals(view, base.unionByName(b1))

    view.refresh(b2)
    _assert_state_equals(view, orders)


def test_having_applies_on_read(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders")
    sql = (
        "SELECT o_custkey, count(*) AS n FROM orders "
        "GROUP BY o_custkey HAVING count(*) >= 5"
    )
    view = ContinuousAggregate(spark, str(tmp_path / "state"), sql)
    view.initialize(orders.where("o_orderkey % 2 = 0"))
    view.refresh(orders.where("o_orderkey % 2 = 1"))
    got = {r["o_custkey"]: r["n"] for r in view.read().collect()}
    exp = {
        r["o_custkey"]: r["n"]
        for r in orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .where("n >= 5")
        .collect()
    }
    # A group crossing the threshold only after the second batch must
    # appear; one below it must not.
    assert got == exp and 0 < len(got)


def test_rejects_count_distinct(spark, tmp_path):
    with pytest.raises(UnsupportedSQL, match="distinct-pair"):
        ContinuousAggregate(
            spark,
            str(tmp_path / "s"),
            "SELECT a, count(DISTINCT b) AS u FROM t GROUP BY a",
        )


def test_rejects_null_grouping_key_in_batch(spark, tmp_path):
    t0 = spark.createDataFrame([("a", 1)], "k: string, v: int")
    view = ContinuousAggregate(
        spark,
        str(tmp_path / "s"),
        "SELECT k, sum(v) AS total FROM t GROUP BY k",
    )
    view.initialize(t0)
    bad = spark.createDataFrame([(None, 2)], "k: string, v: int")
    with pytest.raises(ValueError, match="NULL grouping key"):
        view.refresh(bad)
    # State unharmed by the rejected batch.
    assert [tuple(r) for r in view.read().collect()] == [("a", 1)]


# -- retraction-capable refresh (signed / CDF batches) -----------------

def _cdf(df, change_type):
    return df.withColumn("_change_type", F.lit(change_type))


def test_signed_refresh_cycles_equal_full_recompute(spark, tmp_path):
    """initialize + two CDF refresh cycles (inserts + deletes +
    updates): after each cycle the stored table equals the batch
    recompute over the post-change state — including a group-moving
    update (priority rewritten) and min/max retraction."""
    orders = load_table(spark, SF_SMALL, "orders")

    s0 = orders.where("o_orderkey % 4 IN (0, 1, 2)")  # initial state
    view = ContinuousAggregate(spark, str(tmp_path / "state"), SQL)
    view.initialize(s0)

    # Cycle 1: insert the %4=3 rows, delete the %4=0 rows, update the
    # %4=1 rows (price +50000 — moves extrema; priority rewritten —
    # moves rows BETWEEN groups).
    ins1 = orders.where("o_orderkey % 4 = 3")
    del1 = orders.where("o_orderkey % 4 = 0")
    pre1 = orders.where("o_orderkey % 4 = 1")
    post1 = pre1.withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(50000.0)
    ).withColumn("o_orderpriority", F.lit("9-MOVED"))
    batch1 = (
        _cdf(ins1, "insert")
        .unionByName(_cdf(del1, "delete"))
        .unionByName(_cdf(pre1, "update_preimage"))
        .unionByName(_cdf(post1, "update_postimage"))
    )
    s1 = orders.where("o_orderkey % 4 IN (2, 3)").unionByName(post1)
    view.refresh_signed(batch1, base_new_df=s1)
    _assert_state_equals(view, s1)

    # Cycle 2: delete every moved row — the '9-MOVED' group's count
    # reaches zero and must LEAVE the state table.
    batch2 = _cdf(post1, "delete")
    s2 = orders.where("o_orderkey % 4 IN (2, 3)")
    view.refresh_signed(batch2, base_new_df=s2)
    _assert_state_equals(view, s2)
    assert "9-MOVED" not in _rows(view.read())


def test_signed_refresh_sum_count_needs_no_base(spark, tmp_path):
    """Statements without min/max merge purely from signed partials —
    no base-table handle required."""
    t0 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k: string, v: int"
    )
    view = ContinuousAggregate(
        spark, str(tmp_path / "s"),
        "SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k",
    )
    view.initialize(t0)
    batch = spark.createDataFrame(
        [("a", 2, "delete"), ("b", 5, "update_preimage"),
         ("b", 7, "update_postimage"), ("c", 9, "insert")],
        "k: string, v: int, _change_type: string",
    )
    view.refresh_signed(batch)
    got = {r["k"]: (r["n"], r["total"]) for r in view.read().collect()}
    assert got == {"a": (1, 1), "b": (1, 7), "c": (1, 9)}


def test_signed_refresh_rejects_minmax_without_base(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders")
    view = ContinuousAggregate(spark, str(tmp_path / "state"), SQL)
    view.initialize(orders)
    with pytest.raises(ValueError, match="min/max"):
        view.refresh_signed(_cdf(orders.limit(1), "delete"))


def test_signed_refresh_rejects_over_retraction(spark, tmp_path):
    t0 = spark.createDataFrame([("a", 1)], "k: string, v: int")
    view = ContinuousAggregate(
        spark, str(tmp_path / "s"),
        "SELECT k, sum(v) AS total FROM t GROUP BY k",
    )
    view.initialize(t0)
    bad = spark.createDataFrame(
        [("a", 1, "delete"), ("a", 1, "delete")],
        "k: string, v: int, _change_type: string",
    )
    with pytest.raises(ValueError, match="negative live count"):
        view.refresh_signed(bad)
    # State unharmed by the rejected batch.
    assert [tuple(r) for r in view.read().collect()] == [("a", 1)]


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once; a replayed (batch_id, batch) must
    not double-count. The marker guard skips the second application."""
    t0 = spark.createDataFrame([("a", 1)], "k: string, v: int")
    view = ContinuousAggregate(
        spark, str(tmp_path / "s"),
        "SELECT k, sum(v) AS total, count(*) AS n FROM t GROUP BY k",
    )
    view.initialize(t0)
    batch = spark.createDataFrame([("a", 10)], "k: string, v: int")
    view._apply_once(7, lambda: view.refresh(batch))
    view._apply_once(7, lambda: view.refresh(batch))  # replay: no-op
    got = [tuple(r) for r in view.read().collect()]
    assert got == [("a", 11, 2)]
    view._apply_once(8, lambda: view.refresh(batch))  # new id applies
    assert [tuple(r) for r in view.read().collect()] == [("a", 21, 3)]


def test_signed_refresh_expression_grouping_key(spark, tmp_path):
    """Regression (review finding): the min/max scoped recompute must
    evaluate EXPRESSION grouping keys on the base — joining the raw
    base on the output alias crashed (no such column), and an alias
    shadowing a base column silently mis-restricted the recompute."""
    t0 = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 9)], "k: string, v: int"
    )
    view = ContinuousAggregate(
        spark, str(tmp_path / "s"),
        "SELECT upper(k) AS g, min(v) AS lo, count(*) AS n "
        "FROM t GROUP BY upper(k)",
    )
    view.initialize(t0)
    batch = spark.createDataFrame(
        [("a", 1, "delete")], "k: string, v: int, _change_type: string"
    )
    new_state = spark.createDataFrame(
        [("a", 5), ("b", 9)], "k: string, v: int"
    )
    view.refresh_signed(batch, base_new_df=new_state)
    got = {r["g"]: (r["lo"], r["n"]) for r in view.read().collect()}
    assert got == {"A": (5, 1), "B": (9, 1)}  # deleted minimum promoted


def test_signed_refresh_alias_shadows_base_column(spark, tmp_path):
    """The shadowing variant: output alias equals a base column name
    with DIFFERENT values — a name-based join would silently compare
    raw k to upper(k) and drop touched groups from the recompute."""
    t0 = spark.createDataFrame(
        [("a", 1), ("a", 5)], "k: string, v: int"
    )
    view = ContinuousAggregate(
        spark, str(tmp_path / "s"),
        "SELECT upper(k) AS k, max(v) AS hi, count(*) AS n "
        "FROM t GROUP BY upper(k)",
    )
    view.initialize(t0)
    batch = spark.createDataFrame(
        [("a", 5, "delete")], "k: string, v: int, _change_type: string"
    )
    new_state = spark.createDataFrame([("a", 1)], "k: string, v: int")
    view.refresh_signed(batch, base_new_df=new_state)
    assert [tuple(r) for r in view.read().collect()] == [("A", 1, 1)]


def test_reinitialize_clears_replay_markers(spark, tmp_path):
    """Regression (review finding): markers from a previous life of the
    state path must not make a rebuilt view treat a fresh stream's
    batch 0 as a replay and silently freeze."""
    import shutil

    t0 = spark.createDataFrame([("a", 1)], "k: string, v: int")
    view = ContinuousAggregate(
        spark, str(tmp_path / "s"),
        "SELECT k, sum(v) AS total FROM t GROUP BY k",
    )
    view.initialize(t0)
    batch = spark.createDataFrame([("a", 10)], "k: string, v: int")
    view._apply_once(0, lambda: view.refresh(batch), stream_ns="ck1")
    assert [tuple(r) for r in view.read().collect()] == [("a", 11)]
    # Rebuild the view from scratch (state dir deleted, markers stale).
    shutil.rmtree(str(tmp_path / "s"))
    view.initialize(t0)
    view._apply_once(0, lambda: view.refresh(batch), stream_ns="ck1")
    assert [tuple(r) for r in view.read().collect()] == [("a", 11)]
    # Distinct stream namespaces never collide on batch ids.
    view._apply_once(0, lambda: view.refresh(batch), stream_ns="ck2")
    assert [tuple(r) for r in view.read().collect()] == [("a", 21)]
