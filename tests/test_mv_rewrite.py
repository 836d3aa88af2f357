"""Materialized-view rewrite matcher — plans/mv_rewrite.py.

The registered query (sql_mv_rewrite) certifies the happy path +
two refusals against the DuckDB oracle; these pin the matcher's
edge semantics: avg derivation needs BOTH partials, grouping may be
an EXPRESSION over MV keys, and every non-exact case refuses."""

from __future__ import annotations

import os

import pytest

from datafusion_delta_queries_spark.plans.mv_rewrite import (
    MaterializedView,
    _column_refs,
)
from datafusion_delta_queries_spark.plans.sql_frontend import UnsupportedSQL

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def mv(spark, tmp_path_factory):
    path = os.path.join(str(tmp_path_factory.mktemp("mv")), "store")
    m = MaterializedView(
        "t",
        "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt, "
        "sum(o_totalprice) AS s_total, count(o_totalprice) AS c_total, "
        "max(o_orderkey) AS mx "
        "FROM orders GROUP BY o_orderstatus, o_orderpriority",
        path,
    )
    m.build(spark, SF_SMALL)
    return m


def test_column_refs_skip_functions_literals_keywords():
    assert _column_refs(
        "date_format(o_orderdate, 'yyyy') IN ('1997') AND o_orderkey "
        "BETWEEN 1 AND CAST(x AS BIGINT)"
    ) == {"o_orderdate", "o_orderkey", "x"}


def test_avg_needs_both_partials(spark, mv):
    # sum + count of the SAME arg stored -> derivable
    ok = mv.rewrite(
        spark,
        "SELECT o_orderstatus, avg(o_totalprice) AS a FROM orders "
        "GROUP BY o_orderstatus",
    )
    assert ok is not None
    got = {r["o_orderstatus"]: round(r["a"], 6) for r in ok.collect()}
    want = {
        r["o_orderstatus"]: round(r["a"], 6)
        for r in spark.sql(
            "SELECT o_orderstatus, avg(o_totalprice) AS a FROM orders "
            "GROUP BY o_orderstatus"
        ).collect()
    }
    assert got == want
    # avg of a column whose sum partial is missing -> refuse
    assert (
        mv.rewrite(
            spark,
            "SELECT o_orderstatus, avg(o_orderkey) AS a FROM orders "
            "GROUP BY o_orderstatus",
        )
        is None
    )


def test_expression_over_mv_key_groups(spark, mv):
    out = mv.rewrite(
        spark,
        "SELECT substring(o_orderpriority, 1, 1) AS pri, count(*) AS n "
        "FROM orders GROUP BY substring(o_orderpriority, 1, 1)",
    )
    assert out is not None
    got = {(r["pri"], r["n"]) for r in out.collect()}
    want = {
        (r["pri"], r["n"])
        for r in spark.sql(
            "SELECT substring(o_orderpriority, 1, 1) AS pri, "
            "count(*) AS n FROM orders "
            "GROUP BY substring(o_orderpriority, 1, 1)"
        ).collect()
    }
    assert got == want


def test_refusals(spark, mv):
    # different table
    assert (
        mv.rewrite(
            spark,
            "SELECT c_mktsegment, count(*) AS n FROM customer "
            "GROUP BY c_mktsegment",
        )
        is None
    )
    # aggregate the MV does not store
    assert (
        mv.rewrite(
            spark,
            "SELECT o_orderstatus, min(o_orderkey) AS m FROM orders "
            "GROUP BY o_orderstatus",
        )
        is None
    )
    # grouping key outside the MV keys
    assert (
        mv.rewrite(
            spark,
            "SELECT o_custkey, count(*) AS n FROM orders "
            "GROUP BY o_custkey",
        )
        is None
    )
    # HAVING is out of scope
    assert (
        mv.rewrite(
            spark,
            "SELECT o_orderstatus, count(*) AS n FROM orders "
            "GROUP BY o_orderstatus HAVING count(*) > 5",
        )
        is None
    )


def test_definition_guards():
    with pytest.raises(UnsupportedSQL, match="DISTINCT"):
        MaterializedView(
            "x",
            "SELECT o_orderstatus, count(DISTINCT o_custkey) AS c "
            "FROM orders GROUP BY o_orderstatus",
            "/tmp/never",
        )


@pytest.fixture(scope="module")
def filtered_mv(spark, tmp_path_factory):
    path = os.path.join(str(tmp_path_factory.mktemp("fmv")), "store")
    m = MaterializedView(
        "f",
        "SELECT o_orderpriority, count(*) AS cnt, "
        "sum(o_totalprice) AS s_total, count(o_totalprice) AS c_total "
        "FROM orders WHERE o_orderstatus = 'F' "
        "GROUP BY o_orderpriority",
        path,
    )
    m.build(spark, SF_SMALL)
    return m


def test_filtered_mv_implication(spark, filtered_mv):
    # candidate = view conjunct + a key-only residual -> served, with
    # the residual applied to stored rows
    out = filtered_mv.rewrite(
        spark,
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "WHERE o_orderstatus = 'F' AND o_orderpriority IN "
        "('1-URGENT', '2-HIGH') GROUP BY o_orderpriority",
    )
    assert out is not None
    got = {(r["o_orderpriority"], r["n"]) for r in out.collect()}
    want = {
        (r["o_orderpriority"], r["n"])
        for r in spark.sql(
            "SELECT o_orderpriority, count(*) AS n FROM orders "
            "WHERE o_orderstatus = 'F' AND o_orderpriority IN "
            "('1-URGENT', '2-HIGH') GROUP BY o_orderpriority"
        ).collect()
    }
    assert got == want


def test_filtered_mv_refusals(spark, filtered_mv):
    # candidate WITHOUT the view conjunct cannot imply the view
    assert (
        filtered_mv.rewrite(
            spark,
            "SELECT o_orderpriority, count(*) AS n FROM orders "
            "GROUP BY o_orderpriority",
        )
        is None
    )
    # a DIFFERENT literal does not match token-identically
    assert (
        filtered_mv.rewrite(
            spark,
            "SELECT o_orderpriority, count(*) AS n FROM orders "
            "WHERE o_orderstatus = 'O' GROUP BY o_orderpriority",
        )
        is None
    )
    # literal case differs inside the string -> no collision
    assert (
        filtered_mv.rewrite(
            spark,
            "SELECT o_orderpriority, count(*) AS n FROM orders "
            "WHERE o_orderstatus = 'f' GROUP BY o_orderpriority",
        )
        is None
    )
    # residual over a non-key column must refuse (those rows are
    # already collapsed into the stored groups)
    assert (
        filtered_mv.rewrite(
            spark,
            "SELECT o_orderpriority, count(*) AS n FROM orders "
            "WHERE o_orderstatus = 'F' AND o_totalprice > 1000 "
            "GROUP BY o_orderpriority",
        )
        is None
    )


def test_interval_unit_words_err_toward_refusal(spark, mv):
    """`day`/`month`/… are NOT masked as keywords: a column literally
    named `day` must be seen as a column (else a non-key filter could
    slip through and rewrite WRONG), so an INTERVAL-unit filter just
    refuses — the safe direction."""
    # case is preserved (matching stays conservative: an unknown-case
    # identifier refuses rather than resolves)
    assert "DAY" in _column_refs(
        "o_orderdate > DATE'1997-01-01' - INTERVAL 30 DAY"
    )
    assert (
        mv.rewrite(
            spark,
            "SELECT o_orderstatus, count(*) AS n FROM orders "
            "WHERE o_orderdate > DATE'1997-01-01' - INTERVAL 30 DAY "
            "GROUP BY o_orderstatus",
        )
        is None
    )


@pytest.fixture(scope="module")
def join_mv(spark, tmp_path_factory):
    path = os.path.join(str(tmp_path_factory.mktemp("jmv")), "store")
    m = MaterializedView(
        "j",
        "SELECT o_orderpriority, l_returnflag, count(*) AS cnt, "
        "sum(l_quantity) AS s_qty, count(l_quantity) AS c_qty "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority, l_returnflag",
        path,
    )
    m.build(spark, SF_SMALL)
    return m


def test_join_mv_serves_matching_fragment(spark, join_mv):
    out = join_mv.rewrite(
        spark,
        "SELECT l_returnflag, avg(l_quantity) AS a "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag",
    )
    assert out is not None
    got = {r["l_returnflag"]: round(r["a"], 9) for r in out.collect()}
    want = {
        r["l_returnflag"]: round(r["a"], 9)
        for r in spark.sql(
            "SELECT l_returnflag, avg(l_quantity) AS a "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY l_returnflag"
        ).collect()
    }
    assert got == want


def test_join_mv_serves_reordered_and_aliased_fragments(spark, join_mv):
    """The SAME inner equi-join written in reversed order, or under
    table aliases, canonicalizes to the view's signature and is
    served (r13 verdict item 6 — canonicalize, never fuzzy-match)."""
    want = {
        (r["l_returnflag"], r["n"])
        for r in spark.sql(
            "SELECT l_returnflag, count(*) AS n "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY l_returnflag"
        ).collect()
    }
    reordered = join_mv.rewrite(
        spark,
        "SELECT l_returnflag, count(*) AS n FROM orders "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag",
    )
    assert reordered is not None
    assert {(r["l_returnflag"], r["n"]) for r in reordered.collect()} == want
    aliased = join_mv.rewrite(
        spark,
        "SELECT l_returnflag, count(*) AS n FROM orders o "
        "JOIN lineitem AS l ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag",
    )
    assert aliased is not None
    assert {(r["l_returnflag"], r["n"]) for r in aliased.collect()} == want


def test_join_mv_refuses_nonmatching_fragments(spark, join_mv):
    # a GENUINELY different join (different ON column) stays red-path
    assert (
        join_mv.rewrite(
            spark,
            "SELECT l_returnflag, count(*) AS n FROM orders "
            "JOIN lineitem ON l_partkey = o_orderkey "
            "GROUP BY l_returnflag",
        )
        is None
    )
    # an OUTER join never canonical-matches an inner-join view
    assert (
        join_mv.rewrite(
            spark,
            "SELECT l_returnflag, count(*) AS n FROM orders "
            "LEFT JOIN lineitem ON l_orderkey = o_orderkey "
            "GROUP BY l_returnflag",
        )
        is None
    )
    # single-table query against a join MV
    assert (
        join_mv.rewrite(
            spark,
            "SELECT l_returnflag, count(*) AS n FROM lineitem "
            "GROUP BY l_returnflag",
        )
        is None
    )
    # non-key filter: those base rows are already collapsed
    assert (
        join_mv.rewrite(
            spark,
            "SELECT l_returnflag, count(*) AS n "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipmode = 'AIR' GROUP BY l_returnflag",
        )
        is None
    )


def test_fragment_core_preserves_literal_case():
    """String literals keep their case in the normalized core: two ON
    clauses differing only in a literal must NOT collide."""
    from datafusion_delta_queries_spark.plans.mv_rewrite import (
        _fragment_parts,
    )

    a, _, _, ca = _fragment_parts(
        "SELECT x AS _k0 FROM t JOIN u ON t.k = u.k AND t.tag = 'ABC'"
    )
    b, _, _, cb = _fragment_parts(
        "SELECT x AS _k0 FROM t JOIN u ON t.k = u.k AND t.tag = 'abc'"
    )
    assert a != b
    assert ca != cb  # literal case survives canonicalization too
    core, where, tables, _ = _fragment_parts(
        "SELECT x AS _k0 FROM lineitem JOIN orders ON l_orderkey = "
        "o_orderkey WHERE o_orderpriority = '1-URGENT'"
    )
    assert tables == ["lineitem", "orders"]
    assert where == "o_orderpriority = '1-URGENT'"
    assert core.startswith("from lineitem join orders on")


def test_canonical_signature_rules():
    """Order/alias-independent for inner equi-joins; None for every
    shape it cannot prove (the exact-token fallback then applies)."""
    from datafusion_delta_queries_spark.plans.mv_rewrite import (
        _fragment_parts,
    )

    def canon(frag):
        return _fragment_parts(frag)[3]

    base = canon(
        "SELECT x AS _k0 FROM lineitem JOIN orders "
        "ON l_orderkey = o_orderkey"
    )
    assert base is not None
    # reversed order and flipped equality sides canonicalize equal
    assert base == canon(
        "SELECT x AS _k0 FROM orders JOIN lineitem "
        "ON o_orderkey = l_orderkey"
    )
    # aliases erase to table names
    assert canon(
        "SELECT x AS _k0 FROM lineitem l JOIN orders AS o "
        "ON l.l_orderkey = o.o_orderkey"
    ) == canon(
        "SELECT x AS _k0 FROM orders ord JOIN lineitem li "
        "ON li.l_orderkey = ord.o_orderkey"
    )
    # a different ON column is a different signature
    assert base != canon(
        "SELECT x AS _k0 FROM lineitem JOIN orders "
        "ON l_partkey = o_orderkey"
    )
    # qualified and unqualified refs do NOT conflate
    assert base != canon(
        "SELECT x AS _k0 FROM lineitem JOIN orders "
        "ON lineitem.l_orderkey = orders.o_orderkey"
    )
    # self-joins refuse canonicalization (alias erasure would
    # conflate the two sides)
    assert canon(
        "SELECT x AS _k0 FROM orders a JOIN orders b "
        "ON a.o_orderkey = b.o_orderkey"
    ) is None
    # non-equality ON terms refuse
    assert canon(
        "SELECT x AS _k0 FROM lineitem JOIN orders "
        "ON l_orderkey = o_orderkey AND l_quantity < 10"
    ) is None


def test_between_is_one_conjunct():
    from datafusion_delta_queries_spark.plans.mv_rewrite import (
        _conjuncts,
    )

    got = _conjuncts("k BETWEEN 10 AND 50 AND s = 'x'")
    assert [n for n, _ in got] == ["k between 10 and 50", "s = 'x'"]
    # parenthesized bounds keep the following AND attached
    got = _conjuncts("k BETWEEN (1 + 2) AND f(3) AND s = 'x'")
    assert len(got) == 2 and got[1][0] == "s = 'x'"


def test_case_in_where_refuses_loudly():
    from datafusion_delta_queries_spark.plans.mv_rewrite import (
        _conjuncts,
    )

    with pytest.raises(UnsupportedSQL, match="CASE"):
        _conjuncts("CASE WHEN a = 1 AND b = 2 THEN 1 ELSE 0 END = 1")


def test_between_on_key_column_serves(spark, filtered_mv):
    """Regression for the r13 advice bug: a candidate WHERE carrying
    BETWEEN on an MV key column must be served (residual applied to
    stored rows), not raise ParseException from a mis-split."""
    sql = (
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "WHERE o_orderstatus = 'F' AND o_orderpriority "
        "BETWEEN '1-URGENT' AND '2-HIGH' GROUP BY o_orderpriority"
    )
    out = filtered_mv.rewrite(spark, sql)
    assert out is not None
    got = {(r["o_orderpriority"], r["n"]) for r in out.collect()}
    want = {
        (r["o_orderpriority"], r["n"])
        for r in spark.sql(sql).collect()
    }
    assert got == want


def test_between_never_token_collides(spark, filtered_mv):
    """'a BETWEEN x AND y' fragments must not cross-match unrelated
    candidate predicates; rewrite() refuses (None), never raises."""
    assert (
        filtered_mv.rewrite(
            spark,
            "SELECT o_orderpriority, count(*) AS n FROM orders "
            "WHERE o_orderstatus BETWEEN 'A' AND 'F' "
            "GROUP BY o_orderpriority",
        )
        is None
    )
    # CASE in a candidate WHERE: refuse, never raise
    assert (
        filtered_mv.rewrite(
            spark,
            "SELECT o_orderpriority, count(*) AS n FROM orders "
            "WHERE CASE WHEN o_orderstatus = 'F' AND o_orderkey > 0 "
            "THEN 1 ELSE 0 END = 1 GROUP BY o_orderpriority",
        )
        is None
    )
