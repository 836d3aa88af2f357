"""Generic as-of join operator + ASOF JOIN SQL dialect: matches vs a
brute-force argmax, direction/tolerance/inner semantics, tie
inclusivity, and loud rejections."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.functions.asof import asof_join
from datafusion_delta_queries_spark.plans.sql_extensions import (
    run_asof_sql,
)
from datafusion_delta_queries_spark.plans.sql_frontend import UnsupportedSQL


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [
            ("a", 10, 100.0),
            ("a", 20, 101.0),
            ("a", 35, 102.0),
            ("b", 5, 50.0),
            ("b", 40, 51.0),
            ("c", 7, 7.0),  # no quotes at all for c
        ],
        "k string, ts int, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("a", 8, 1.0),
            ("a", 20, 2.0),  # tie with trade ts=20 → inclusive
            ("a", 30, 3.0),
            ("b", 10, 4.0),
        ],
        "k string, qts int, bid double",
    )
    return trades, quotes


def _brute(spark, trades, quotes, direction="backward"):
    """Reference semantics via a quadratic theta join + argmax."""
    cmp_ = "q.qts <= t.ts" if direction == "backward" else "q.qts >= t.ts"
    pick = "max(q.qts)" if direction == "backward" else "min(q.qts)"
    trades.createOrReplaceTempView("bt")
    quotes.createOrReplaceTempView("bq")
    return spark.sql(f"""
        SELECT t.k, t.ts, t.price, m.mts AS qts,
               (SELECT max(bid) FROM bq q2
                WHERE q2.k = t.k AND q2.qts = m.mts) AS bid
        FROM bt t LEFT JOIN (
          SELECT t.k AS mk, t.ts AS mt, {pick} AS mts
          FROM bt t JOIN bq q ON q.k = t.k AND {cmp_}
          GROUP BY t.k, t.ts
        ) m ON m.mk = t.k AND m.mt = t.ts
    """)


def test_backward_matches_brute_force(spark, frames):
    trades, quotes = frames
    got = sorted(
        map(
            tuple,
            asof_join(
                trades, quotes, ["k"], "ts", "qts"
            ).select("k", "ts", "price", "qts", "bid").collect(),
        )
    )
    want = sorted(map(tuple, _brute(spark, trades, quotes).collect()))
    assert got == want
    # spot-check tie inclusivity and the no-quote key
    d = {(r[0], r[1]): (r[3], r[4]) for r in got}
    assert d[("a", 20)] == (20, 2.0)  # tie included
    assert d[("c", 7)] == (None, None)


def test_forward_matches_brute_force(spark, frames):
    trades, quotes = frames
    got = sorted(
        map(
            tuple,
            asof_join(
                trades, quotes, ["k"], "ts", "qts", direction="forward"
            ).select("k", "ts", "price", "qts", "bid").collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            _brute(spark, trades, quotes, "forward").collect(),
        )
    )
    assert got == want


def test_inner_drops_unmatched(spark, frames):
    trades, quotes = frames
    got = asof_join(trades, quotes, ["k"], "ts", "qts", how="inner")
    rows = got.collect()
    ks = {r["k"] for r in rows}
    assert "c" not in ks
    # b@5's earliest b quote is 10 > 5 → unmatched, dropped too
    assert ("b", 5) not in {(r["k"], r["ts"]) for r in rows}
    assert len(rows) == 4


def test_tolerance_voids_far_matches(spark, frames):
    trades, quotes = frames
    got = asof_join(
        trades,
        quotes,
        ["k"],
        "ts",
        "qts",
        tolerance=F.lit(5),
    )
    d = {(r["k"], r["ts"]): r["qts"] for r in got.collect()}
    assert d[("a", 10)] == 8  # gap 2 ≤ 5
    assert d[("a", 35)] == 30  # gap 5 ≤ 5 (inclusive)
    assert d[("b", 40)] is None  # gap 30 > 5 → voided, row kept


def test_rejections(spark, frames):
    trades, quotes = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades,
            quotes.withColumnRenamed("bid", "price"),
            ["k"],
            "ts",
            "qts",
        )
    with pytest.raises(ValueError, match="how"):
        asof_join(trades, quotes, ["k"], "ts", "qts", how="full")
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            trades, quotes, ["k"], "ts", "qts", direction="sideways"
        )
    with pytest.raises(ValueError, match="key"):
        asof_join(trades, quotes, ["nope"], "ts", "qts")


def test_sql_asof_matches_operator(spark, frames):
    trades, quotes = frames
    trades.createOrReplaceTempView("trades_v")
    quotes.createOrReplaceTempView("quotes_v")
    got = sorted(
        map(
            tuple,
            run_asof_sql(
                spark,
                "SELECT t.k, t.ts, t.bid FROM trades_v t "
                "ASOF LEFT JOIN quotes_v q "
                "ON t.k = q.k AND t.ts >= q.qts "
                "ORDER BY k, ts",
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            asof_join(trades, quotes, ["k"], "ts", "qts")
            .select("k", "ts", "bid")
            .collect(),
        )
    )
    assert got == want


def test_sql_asof_flipped_operands_and_inner(spark, frames):
    trades, quotes = frames
    trades.createOrReplaceTempView("trades_v")
    quotes.createOrReplaceTempView("quotes_v")
    got = run_asof_sql(
        spark,
        "SELECT t.k, t.ts, t.bid FROM trades_v t ASOF JOIN quotes_v q "
        "ON q.k = t.k AND q.qts <= t.ts",
    )
    assert got.where("bid IS NULL").count() == 0
    assert got.count() == 4


def test_sql_asof_rejections(spark, frames):
    trades, quotes = frames
    trades.createOrReplaceTempView("trades_v")
    quotes.createOrReplaceTempView("quotes_v")
    base = "SELECT t.k FROM trades_v t ASOF JOIN quotes_v q ON "
    for cond in (
        "t.k = q.k",  # no inequality
        "t.ts >= q.qts AND t.ts <= q.qts",  # two inequalities
        "t.k = q.k AND t.ts > q.qts",  # strict op unsupported
        "t.k = t.k AND t.ts >= q.qts",  # same-side comparison
    ):
        with pytest.raises(UnsupportedSQL):
            run_asof_sql(spark, base + cond)
