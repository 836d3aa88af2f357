"""bench.py subset selection — the guard against silently measuring
nothing (r7 advice: ``SPARK_GRAFT_BENCH_ONLY=","`` passed the
unknown-name check and printed a plausible zero-query result)."""

from __future__ import annotations

import pytest

from bench import HEADLINE, select_queries


def test_none_and_empty_run_full_suite():
    assert select_queries(None) == HEADLINE
    assert select_queries("") == HEADLINE


def test_subset_preserves_headline_order():
    picked = select_queries("join_asof,flagship_revenue")
    assert picked == ("flagship_revenue", "join_asof")


def test_unknown_name_raises():
    with pytest.raises(ValueError, match="unknown"):
        select_queries("flagship_revenue,not_a_query")


@pytest.mark.parametrize("only", [",", " , ,", "  "])
def test_separator_only_value_raises(only):
    with pytest.raises(ValueError, match="names no queries"):
        select_queries(only)
