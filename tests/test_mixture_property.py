"""Property test for the llm_mixture_budget waterfill: the Spark SQL
closed form must agree with a direct Python reference on random
domain profiles — allocation never exceeds the budget, is maximal
(cap+1 would overflow), funds every domain fully when the budget
covers the corpus, and never allocates more than a domain has."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _reference_waterfill(avail: list[int], budget: int) -> list[int]:
    """Direct O(k log k) reference: largest integer cap with
    sum(min(a, cap)) <= budget; alloc = min(a, cap)."""
    order = sorted(range(len(avail)), key=lambda i: avail[i])
    prefix = 0
    cap = None
    for rank, i in enumerate(order):
        remaining = len(avail) - rank
        cand = (budget - prefix) // remaining
        if cand < avail[i]:
            cap = cand
            break
        prefix += avail[i]
    return [a if cap is None else min(a, cap) for a in avail]


def _spark_waterfill(spark, avail: list[int], budget: int) -> list[int]:
    """The SAME window/prefix-sum formulation q_llm_mixture_budget
    compiles, parameterized by explicit avail/budget."""
    rows = [(i, int(a)) for i, a in enumerate(avail)]
    domains = spark.createDataFrame(rows, "dom bigint, avail bigint")
    totals = domains.agg(
        F.count("*").cast("bigint").alias("k"),
        F.lit(int(budget)).cast("bigint").alias("budget"),
    )
    w = Window.orderBy("avail", "dom")
    ranked = (
        domains.crossJoin(F.broadcast(totals))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "prefix_before",
            F.coalesce(
                F.sum("avail").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        )
        .withColumn(
            "cand", F.expr("(budget - prefix_before) DIV (k - rn + 1)")
        )
    )
    cap = (
        ranked.where("cand < avail")
        .orderBy("rn")
        .limit(1)
        .selectExpr("cand AS cap")
    )
    out = (
        ranked.join(F.broadcast(cap), F.lit(True), "left")
        .selectExpr(
            "dom", "CAST(least(avail, coalesce(cap, avail)) AS BIGINT) AS alloc"
        )
        .collect()
    )
    return [r["alloc"] for r in sorted(out, key=lambda r: r["dom"])]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    avail=st.lists(st.integers(min_value=0, max_value=10_000),
                   min_size=1, max_size=12),
    frac=st.integers(min_value=0, max_value=120),
)
def test_waterfill_matches_reference_and_invariants(spark, avail, frac):
    total = sum(avail)
    budget = total * frac // 100  # 0%..120% of the corpus
    got = _spark_waterfill(spark, avail, budget)
    want = _reference_waterfill(avail, budget)
    assert got == want, (avail, budget, got, want)
    alloc = sum(got)
    assert alloc <= budget or budget >= total
    assert all(0 <= g <= a for g, a in zip(got, avail))
    if budget >= total:
        assert got == avail  # everything fully funded
    elif alloc < budget:
        # maximality: raising the cap by 1 must overflow the budget
        cap = max(got) if any(g < a for g, a in zip(got, avail)) else None
        if cap is not None:
            assert sum(min(a, cap + 1) for a in avail) > budget
