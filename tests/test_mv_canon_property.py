"""Property tests for the MV join canonicalizer — pure string
function, no Spark session.

The safety claim: for INNER-only equi-join chains,
``_canonical_join_signature`` is invariant under (a) join-unit
reordering, (b) alias renaming, (c) equality-side flips, and (d) ON
conjunct reordering — and NOTHING else: change a predicate, a table,
or a join shape and the signature differs or refuses (None). Both
directions matter — invariance widens MV hits, sensitivity is what
keeps a wrong rewrite impossible."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_delta_queries_spark.plans.mv_rewrite import _fragment_parts
from datafusion_delta_queries_spark.plans.sql_frontend import UnsupportedSQL

TABLES = ["lineitem", "orders", "customer", "nation", "part", "supplier"]


def canon(frag: str):
    return _fragment_parts("SELECT x AS _k0 " + frag)[3]


@st.composite
def join_chains(draw):
    """A random inner equi-join chain over 2-4 distinct tables with
    1-2 equality conjuncts per ON, plus a reordered/aliased/flipped
    equivalent rendering of the SAME chain."""
    n = draw(st.integers(min_value=2, max_value=4))
    tables = draw(
        st.permutations(TABLES).map(lambda p: list(p[:n]))
    )
    # predicate pool: equalities between per-table column names
    preds = []
    for i in range(1, n):
        n_conj = draw(st.integers(min_value=1, max_value=2))
        for c in range(n_conj):
            lhs = f"{tables[i - 1]}.k{c}"
            rhs = f"{tables[i]}.k{c}"
            preds.append((i, lhs, rhs))

    def render(order, aliases, flip, conj_shuffle):
        names = {t: aliases.get(t, t) for t in tables}

        def q(ref):
            t, col = ref.split(".")
            return f"{names[t]}.{col}"

        # re-attach each conjunct to the LAST join unit that makes
        # both sides visible under the new order
        pos = {t: j for j, t in enumerate(order)}
        by_unit: dict[int, list[str]] = {}
        for _, lhs, rhs in preds:
            lt, rt = lhs.split(".")[0], rhs.split(".")[0]
            unit = max(pos[lt], pos[rt])
            a, b = (lhs, rhs) if not flip else (rhs, lhs)
            by_unit.setdefault(unit, []).append(f"{q(a)} = {q(b)}")
        parts = [f"FROM {order[0]}"]
        if order[0] in aliases:
            parts[0] += f" {aliases[order[0]]}"
        for j, t in enumerate(order[1:], start=1):
            unit = f"JOIN {t}"
            if t in aliases:
                unit += f" AS {aliases[t]}"
            conjs = by_unit.get(j, [])
            if conj_shuffle:
                conjs = list(reversed(conjs))
            if not conjs:
                # a unit with no ON is not this grammar — tie it to
                # the previous table's k0 to stay well-formed
                conjs = [f"{q(order[j - 1] + '.k0')} = {q(t + '.k0')}"]
                preds.append((j, order[j - 1] + ".k0", t + ".k0"))
            unit += " ON " + " AND ".join(conjs)
            parts.append(unit)
        return " ".join(parts)

    base = render(tables, {}, flip=False, conj_shuffle=False)
    order2 = draw(st.permutations(tables).map(list))
    # joins must remain connected under reordering for the SQL to be
    # meaningful; the canonicalizer only sees tokens, so any order
    # exercises it — but keep order2 valid by ensuring each unit's
    # predicates reference already-seen tables: a chain reversed or
    # rotated still satisfies this for path-shaped chains only when
    # adjacent, so fall back to the reverse (always path-valid).
    if order2 != tables and order2 != list(reversed(tables)):
        order2 = list(reversed(tables))
    aliases = {
        t: f"a{j}" for j, t in enumerate(tables) if draw(st.booleans())
    }
    flipped = draw(st.booleans())
    variant = render(order2, aliases, flip=flipped, conj_shuffle=True)
    return base, variant, preds


@given(join_chains())
@settings(max_examples=60, deadline=None)
def test_equivalent_renderings_canonicalize_equal(chain):
    base, variant, _ = chain
    cb, cv = canon(base), canon(variant)
    assert cb is not None
    assert cb == cv, (base, variant)


@given(join_chains(), st.integers(min_value=0, max_value=10**6))
@settings(max_examples=60, deadline=None)
def test_mutated_predicates_never_collide(chain, seed):
    """Mutate one equality's column name — the signature must change
    (never a silent collision with the original)."""
    base, _, preds = chain
    rng = random.Random(seed)
    i, lhs, rhs = preds[rng.randrange(len(preds))]
    mutated = base.replace(f"{lhs} = {rhs}", f"{lhs}_x = {rhs}", 1)
    if mutated == base:  # rendering flipped the sides; mutate rhs
        mutated = base.replace(f"{rhs} = {lhs}", f"{rhs}_x = {lhs}", 1)
    if mutated == base:
        return  # conjunct not present verbatim (aliased variant)
    cb, cm = canon(base), canon(mutated)
    assert cb != cm, (base, mutated)


@given(
    st.lists(
        st.one_of(
            st.tuples(st.sampled_from("abcdek"), st.integers(0, 99)).map(
                lambda t: f"{t[0]} = {t[1]}"
            ),
            st.tuples(
                st.sampled_from("abcdek"),
                st.integers(0, 50),
                st.integers(51, 99),
            ).map(lambda t: f"{t[0]} BETWEEN {t[1]} AND {t[2]}"),
            st.tuples(
                st.sampled_from("abcdek"),
                st.integers(0, 50),
                st.integers(51, 99),
            ).map(lambda t: f"{t[0]} NOT BETWEEN ({t[1]} + 1) AND f({t[2]})"),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_conjunct_splitter_roundtrips_random_betweens(conjuncts):
    """Joining N random conjuncts (equalities and BETWEEN forms, some
    parenthesized/function-wrapped) with AND must split back into
    exactly N pieces whose originals reassemble the input — the
    BETWEEN-internal AND is never a split point."""
    from datafusion_delta_queries_spark.plans.mv_rewrite import _conjuncts

    where = " AND ".join(conjuncts)
    got = _conjuncts(where)
    assert len(got) == len(conjuncts), (where, got)
    # originals rejoin from tokens, so compare modulo whitespace
    assert [orig.replace(" ", "") for _, orig in got] == [
        c.replace(" ", "") for c in conjuncts
    ]


def test_non_canonicalizable_shapes_refuse():
    for frag in (
        "FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey",
        "FROM lineitem CROSS JOIN orders",
        "FROM orders a JOIN orders b ON a.k = b.k",
        "FROM lineitem JOIN orders ON l_orderkey < o_orderkey",
        "FROM lineitem JOIN (SELECT 1 AS x) s ON l_orderkey = s.x",
        # duplicate aliases: illegal SQL must refuse, never be served
        "FROM lineitem x JOIN orders x ON x.l_orderkey = x.o_orderkey",
    ):
        try:
            sig = canon(frag)
        except UnsupportedSQL:
            continue  # the frontend rejecting the shape outright is fine
        assert sig is None, frag