"""Property-based check of the triangle maintenance identity

    tri(G_new) − tri(G_old) = T_{G_new}(A) − T_{G_old}(R)

under RANDOM CDC batches (random disjoint mod-classes over
(l_orderkey, l_linenumber), random modulus — from near-empty deltas
to heavy churn), far beyond the two fixture specs the registered
queries pin. The expected side is computed brute-force in DuckDB
(two full triangle counts over the old/new co-purchase graphs — the
thing the incremental path must land on), the actual side by the
delta-anchored Spark maintainer. Exercises the subtle cases the
docstring claims: triangles with edges in BOTH A and R drop out of
both T-terms; update-only batches cancel; an empty delta yields 0."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_delta_queries_spark.operators.signed_queries import (
    _SIGNED_TRIANGLE_ORACLE_TMPL,
    _new_sql,
    _old_sql,
    q_signed_triangle_maintenance,
)
from datafusion_delta_queries_spark.plans.signed import CdcSpec

from .conftest import SF_SMALL


@st.composite
def cdc_specs(draw):
    a = draw(st.integers(min_value=1, max_value=13))
    m = draw(st.sampled_from([3, 5, 10, 25, 200]))
    classes = draw(
        st.lists(
            st.integers(min_value=0, max_value=m - 1),
            min_size=3,
            max_size=3,
            unique=True,
        )
    )
    key = f"(l_orderkey * {a} + l_linenumber) % {m}"
    return CdcSpec(
        insert_pred=f"{key} = {classes[0]}",
        delete_pred=f"{key} = {classes[1]}",
        update_pred=f"{key} = {classes[2]}",
        # price-only updates: pair contributions must cancel exactly
        update_set={"l_extendedprice": "l_extendedprice + 100.0"},
    )


@given(cdc_specs())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_triangle_identity_under_random_batches(spark, spec):
    specs = {"lineitem": spec}
    got = {
        r["tri_delta"]: (
            r["n_edges_new"], r["n_added_edges"], r["n_removed_edges"]
        )
        for r in q_signed_triangle_maintenance(
            spark, SF_SMALL, specs=specs
        ).collect()
    }
    assert len(got) == 1
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    )
    oracle_sql = _SIGNED_TRIANGLE_ORACLE_TMPL.format(
        old_q=_old_sql("lineitem", spec), new_q=_new_sql("lineitem", spec)
    )
    want = con.execute(oracle_sql).fetchall()[0]
    (tri_delta,) = got
    assert (got[tri_delta][0], got[tri_delta][1], got[tri_delta][2]) == (
        want[0], want[1], want[2]
    )
    assert tri_delta == want[3], (spec.insert_pred, tri_delta, want[3])


def test_triangle_identity_empty_delta(spark):
    """A spec whose classes match no rows must report a 0 delta and
    0 added/removed edges."""
    spec = CdcSpec(
        insert_pred="l_orderkey < 0",
        delete_pred="l_orderkey < -1",
        update_pred="l_orderkey < -2",
        update_set={"l_extendedprice": "l_extendedprice + 100.0"},
    )
    row = q_signed_triangle_maintenance(
        spark, SF_SMALL, specs={"lineitem": spec}
    ).collect()[0]
    assert row["n_added_edges"] == 0
    assert row["n_removed_edges"] == 0
    assert row["tri_delta"] == 0


def test_copurchase_pairs_match_self_join_form(spark):
    """The r17 grouped-expansion rewrite of _copurchase_pairs (one
    collect_set pass + row-local C(n,2) expansion) must stay
    row-identical to the self-join + distinct form it replaced —
    including duplicate-part orders (dedup inside collect_set) and
    single-part orders (empty expansion)."""
    from pyspark.sql import functions as F

    from datafusion_delta_queries_spark.catalog import load_table
    from datafusion_delta_queries_spark.operators.signed_queries import (
        _copurchase_pairs,
    )

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # force a duplicate-part order and a single-part order into the mix
    dup = li.limit(1).unionAll(li.limit(1))
    single = li.limit(1).selectExpr(
        "CAST(-77 AS BIGINT) AS l_orderkey", "l_partkey"
    )
    src = li.unionAll(dup).unionAll(single)

    a, b = src.alias("a"), src.alias("b")
    reference = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .selectExpr(
            "a.l_orderkey AS ok", "a.l_partkey AS u", "b.l_partkey AS v"
        )
        .distinct()
    )
    got = _copurchase_pairs(src)
    assert got.columns == ["ok", "u", "v"]
    assert got.exceptAll(reference).count() == 0
    assert reference.exceptAll(got).count() == 0


def test_tri_touching_matches_wedge_join(spark):
    """The r18 grouped array_intersect wedge closing emits exactly the
    r17 wedge hash join's candidate rows: the distinct-triangle count
    over a graph with shared, multi-delta and isolated triangles must
    match the explicit (x, n)-keyed join formulation."""
    from pyspark.sql import functions as F

    from datafusion_delta_queries_spark.operators.llm_pipeline import (
        release_shared,
    )
    from datafusion_delta_queries_spark.operators.signed_queries import (
        _tri_touching,
    )

    # triangles: {1,2,3}, {2,3,4} (shared edge 2-3), {5,6,7} isolated,
    # plus non-closing edges 1-8, 8-9
    edge_rows = [
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 4),
        (5, 6), (5, 7), (6, 7), (1, 8), (8, 9),
    ]
    edges = spark.createDataFrame(edge_rows, "u INT, v INT")
    for delta_rows in (
        [(2, 3)],                      # edge in TWO triangles
        [(1, 2), (2, 4)],              # two deltas, same triangle set
        [(1, 8)],                      # closes nothing
        [(1, 2), (5, 6), (8, 9)],      # mixed
        edge_rows,                     # delta = whole graph
    ):
        delta = spark.createDataFrame(delta_rows, "u INT, v INT")
        adj = edges.selectExpr("u AS x", "v AS n").unionAll(
            edges.selectExpr("v AS x", "u AS n")
        )
        ref = (
            delta.alias("d")
            .join(adj.alias("p"), F.col("d.u") == F.col("p.x"))
            .join(
                adj.alias("q"),
                (F.col("d.v") == F.col("q.x"))
                & (F.col("p.n") == F.col("q.n")),
            )
            .selectExpr(
                "least(d.u, least(d.v, p.n)) AS t1",
                "CAST(d.u AS BIGINT) + d.v + p.n "
                "- least(d.u, least(d.v, p.n)) "
                "- greatest(d.u, greatest(d.v, p.n)) AS t2",
                "greatest(d.u, greatest(d.v, p.n)) AS t3",
            )
            .distinct()
            .count()
        )
        got = _tri_touching(edges, delta).collect()[0]["n"]
        release_shared()
        assert got == ref, (delta_rows, got, ref)
