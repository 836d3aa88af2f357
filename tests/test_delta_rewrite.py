"""Plan-shape tests for the PosDelta rewrite.

Port of the reference's five unit tests
(/root/reference/src/optimizer_rules/mod.rs:209-504) — same queries,
same asserted output shapes, including the exact 3-branch union order
its cross/keyed-join tests pin down (mod.rs:326-360, 406-440):
[Δ⋈Δ, left⋈Δright, Δleft⋈right].

The reference destructures plans with nested ``if let`` + name asserts
(mod.rs:237-243); our IR nodes are frozen dataclasses so structural
equality does the same job in one line.

Plus one divergence test the reference can't pass: non-inner joins
raise UnsupportedIncrementalOperator instead of being silently
mis-incrementalized (SURVEY §4.3; reference clones join_type verbatim
at mod.rs:126).
"""

from __future__ import annotations

import pytest

from datafusion_delta_queries_spark.plans import (
    CrossJoin,
    Filter,
    Join,
    PosDelta,
    PosDeltaScan,
    Projection,
    Scan,
    Union,
    UnsupportedIncrementalOperator,
    rewrite_pos_delta,
)

USERS = Scan("users")
HOMES = Scan("homes")


def test_projection():
    # mod.rs:209-244 — "select id, name from public.users"
    # asserts Projection → PosDeltaScan
    out = rewrite_pos_delta(PosDelta(Projection(["id", "name"], USERS)))
    assert out == Projection(["id", "name"], PosDeltaScan(USERS))


def test_filter():
    # mod.rs:246-287 — "select * from public.users where id = 1"
    # asserts Projection → Filter → PosDeltaScan
    plan = PosDelta(
        Projection(["id", "name", "age"], Filter("id = 1", USERS))
    )
    out = rewrite_pos_delta(plan)
    assert out == Projection(
        ["id", "name", "age"], Filter("id = 1", PosDeltaScan(USERS))
    )


def test_cross_join():
    # mod.rs:289-367 — "users cross join homes"; asserts
    # Union[CrossJoin(Δ,Δ), CrossJoin(scan,Δ), CrossJoin(Δ,scan)]
    # in exactly that branch order (mod.rs:326-360).
    out = rewrite_pos_delta(PosDelta(CrossJoin(USERS, HOMES)))
    du, dh = PosDeltaScan(USERS), PosDeltaScan(HOMES)
    assert out == Union(
        [CrossJoin(du, dh), CrossJoin(USERS, dh), CrossJoin(du, HOMES)]
    )


def test_join():
    # mod.rs:369-447 — "users join homes on users.address = homes.address";
    # asserts Union[Join(Δ,Δ), Join(scan,Δ), Join(Δ,scan)] with the
    # `on` keys preserved in every branch (mod.rs:406-440).
    on = [("address", "address")]
    out = rewrite_pos_delta(PosDelta(Join(USERS, HOMES, on=on)))
    du, dh = PosDeltaScan(USERS), PosDeltaScan(HOMES)
    assert out == Union(
        [
            Join(du, dh, on=on),
            Join(USERS, dh, on=on),
            Join(du, HOMES, on=on),
        ]
    )


def test_join_preserves_filter_and_type():
    # The reference clones on/filter/join_type through every branch
    # (mod.rs:120-129); inner joins with an extra theta filter keep it.
    on = [("address", "address")]
    j = Join(USERS, HOMES, on=on, join_type="inner", filter="l.age > r.size")
    out = rewrite_pos_delta(PosDelta(j))
    assert isinstance(out, Union) and len(out.inputs) == 3
    for branch in out.inputs:
        assert isinstance(branch, Join)
        assert branch.on == (("address", "address"),)
        assert branch.filter == "l.age > r.size"
        assert branch.join_type == "inner"


def test_join_preserves_null_equals_null():
    # mod.rs:128 clones `null_equals_null` through the rewrite; our IR
    # must carry the flag into all three union branches (and the semi
    # rule's joins), or the compiled delta silently degrades <=> to =.
    on = [("address", "address")]
    j = Join(USERS, HOMES, on=on, null_equals_null=True)
    out = rewrite_pos_delta(PosDelta(j))
    assert isinstance(out, Union) and len(out.inputs) == 3
    for branch in out.inputs:
        assert isinstance(branch, Join)
        assert branch.null_equals_null is True
        assert branch.exprs[0] == "address <=> address"

    semi = Join(USERS, HOMES, on=on, join_type="semi", null_equals_null=True)
    out = rewrite_pos_delta(PosDelta(semi))

    def joins(p):
        if isinstance(p, Join):
            yield p
        for c in p.children:
            yield from joins(c)

    found = list(joins(out))
    assert found and all(b.null_equals_null for b in found)


def test_join_preserves_join_constraint():
    # mod.rs:127 clones `join_constraint` (ON vs USING) through the
    # rewrite — the one remaining reference field; our IR must carry
    # it into all three union branches and the semi rule's joins.
    import pytest

    on = [("address", "address")]
    j = Join(USERS, HOMES, on=on, join_constraint="using")
    out = rewrite_pos_delta(PosDelta(j))
    assert isinstance(out, Union) and len(out.inputs) == 3
    for branch in out.inputs:
        assert isinstance(branch, Join)
        assert branch.join_constraint == "using"
    # rebuild() must clone it too (the rewrite walks via rebuild)
    assert j.rebuild(j.children).join_constraint == "using"
    # default is "on"; anything else is refused loudly
    assert Join(USERS, HOMES, on=on).join_constraint == "on"
    with pytest.raises(ValueError, match="join_constraint"):
        Join(USERS, HOMES, on=on, join_constraint="natural")

    semi = Join(USERS, HOMES, on=on, join_type="semi", join_constraint="using")
    out = rewrite_pos_delta(PosDelta(semi))

    def joins(p):
        if isinstance(p, Join):
            yield p
        for c in p.children:
            yield from joins(c)

    found = list(joins(out))
    assert found and all(b.join_constraint == "using" for b in found)


def test_union():
    # mod.rs:449-504 — "users1 union all users2"; asserts
    # Union[Projection → Δscan, Projection → Δscan], fan-in preserved.
    u1, u2 = Scan("users1"), Scan("users2")
    plan = PosDelta(
        Union([Projection(["id"], u1), Projection(["id"], u2)])
    )
    out = rewrite_pos_delta(plan)
    assert out == Union(
        [
            Projection(["id"], PosDeltaScan(u1)),
            Projection(["id"], PosDeltaScan(u2)),
        ]
    )


def test_union_arbitrary_fan_in():
    # mod.rs:159-180 iterates inputs — fan-in is not hardcoded to 2.
    scans = [Scan(f"t{i}") for i in range(5)]
    out = rewrite_pos_delta(PosDelta(Union(scans)))
    assert out == Union([PosDeltaScan(s) for s in scans])


def test_non_posdelta_root_declines():
    # mod.rs:189-194 — rule only fires on a PosDelta extension root.
    assert rewrite_pos_delta(Projection(["id"], USERS)) is None


def test_unsupported_operator_declines():
    # mod.rs:187 — `_ => Ok(None)`: an unsupported wrapped operator
    # (here modeled by wrapping a PosDeltaScan, which has no rule arm)
    # declines rather than erroring.
    assert rewrite_pos_delta(PosDelta(PosDeltaScan(USERS))) is None


def test_outer_join_raises():
    # Deliberate divergence (SURVEY §4.3): positive deltas cannot
    # retract null-padded (outer) or newly-matched (anti) rows, so
    # those join types refuse. Semi is the exception — see below.
    for jt in ("left", "right", "full", "anti"):
        with pytest.raises(UnsupportedIncrementalOperator):
            rewrite_pos_delta(
                PosDelta(Join(USERS, HOMES, on=[("address", "address")], join_type=jt))
            )


def test_semi_join_rewrite():
    # OUR extension beyond the reference: semi join is monotone on
    # append-only inputs, so Δ(L ⋉ R) = (ΔL ⋉ (R ∪ ΔR)) ∪ ((L ▷ R) ⋉ ΔR).
    on = [("address", "address")]
    out = rewrite_pos_delta(
        PosDelta(Join(USERS, HOMES, on=on, join_type="semi"))
    )
    du, dh = PosDeltaScan(USERS), PosDeltaScan(HOMES)
    assert out == Union(
        [
            Join(du, Union([HOMES, dh]), on=on, join_type="semi"),
            Join(
                Join(USERS, HOMES, on=on, join_type="anti"),
                dh,
                on=on,
                join_type="semi",
            ),
        ]
    )
