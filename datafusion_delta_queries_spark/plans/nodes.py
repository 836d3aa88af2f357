"""Logical plan nodes.

Mirrors the reference's plan vocabulary — the node set its ``PosDelta``
rule matches on (/root/reference/src/optimizer_rules/mod.rs:19-194)
plus its two custom extension nodes (/root/reference/src/delta_node.rs:
PosDeltaNode :8-60, PosDeltaScanNode :63-109).

Each node exposes the same five-point surface the reference's
``UserDefinedLogicalNodeCore`` impls do (delta_node.rs:19-45):
``name`` / ``children`` / ``exprs`` / ``rebuild(children)``; schema is
resolved at compile time by Spark (the reference passes schemas through
untouched, delta_node.rs:27-29).

Expressions are opaque SQL strings — the reference likewise clones
``Vec<Expr>`` through rewrites without inspecting it
(optimizer_rules/mod.rs:33-36).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class UnsupportedIncrementalOperator(Exception):
    """Raised when delta derivation doesn't exist for an operator.

    The reference silently declines with ``Ok(None)``
    (optimizer_rules/mod.rs:187); we fail loudly for the one case where
    silence would be *wrong* rather than conservative: outer/semi/anti
    join types, which the reference incrementalizes with the inner-join
    rule despite that being unsound without retractions (SURVEY §4.3).
    """


@dataclass(frozen=True)
class Plan:
    @property
    def name(self) -> str:
        return type(self).__name__

    @property
    def children(self) -> tuple["Plan", ...]:
        return ()

    @property
    def exprs(self) -> tuple[str, ...]:
        return ()

    def rebuild(self, children: tuple["Plan", ...]) -> "Plan":
        assert not children
        return self


@dataclass(frozen=True)
class Scan(Plan):
    """Leaf: named base table (reference TableScan).

    ``version`` pins the scan to a stored table version (SQL
    ``VERSION AS OF n`` — Delta time travel). None = current state.
    Only snapshot-style compilation supports it; the delta/signed
    rewrites refuse versioned leaves loudly (maintaining a view of a
    PINNED version is a contradiction — its delta is empty by
    definition, and silently treating it as current would be wrong).
    """

    table: str
    version: int | None = None


@dataclass(frozen=True)
class PosDeltaScan(Plan):
    """Marker leaf: scan only the rows appended since the maintained
    version (reference delta_node.rs:63-109; produced at
    optimizer_rules/mod.rs:181-186)."""

    scan: Scan

    @property
    def children(self) -> tuple[Plan, ...]:
        return (self.scan,)

    def rebuild(self, children):
        (child,) = children
        return PosDeltaScan(child)


@dataclass(frozen=True)
class PosDelta(Plan):
    """Marker: the positive delta of the wrapped subtree is requested
    (reference delta_node.rs:8-60)."""

    input: Plan

    @property
    def children(self) -> tuple[Plan, ...]:
        return (self.input,)

    def rebuild(self, children):
        (child,) = children
        return PosDelta(child)


@dataclass(frozen=True)
class Projection(Plan):
    """π — ``select_exprs`` are SQL expression strings with aliases."""

    select_exprs: tuple[str, ...]
    input: Plan

    def __init__(self, select_exprs, input):  # accept any iterable
        object.__setattr__(self, "select_exprs", tuple(select_exprs))
        object.__setattr__(self, "input", input)

    @property
    def children(self) -> tuple[Plan, ...]:
        return (self.input,)

    @property
    def exprs(self) -> tuple[str, ...]:
        return self.select_exprs

    def rebuild(self, children):
        (child,) = children
        return Projection(self.select_exprs, child)


@dataclass(frozen=True)
class Filter(Plan):
    """σ — ``predicate`` is a SQL boolean expression string."""

    predicate: str
    input: Plan

    @property
    def children(self) -> tuple[Plan, ...]:
        return (self.input,)

    @property
    def exprs(self) -> tuple[str, ...]:
        return (self.predicate,)

    def rebuild(self, children):
        (child,) = children
        return Filter(self.predicate, child)


@dataclass(frozen=True)
class Join(Plan):
    """Keyed join: equi ``on`` pairs + optional extra ``filter`` theta
    condition + ``join_type`` + ``null_equals_null`` +
    ``join_constraint`` — the same field set the reference clones
    through its rewrite (optimizer_rules/mod.rs:120-129;
    null_equals_null at :128, join_constraint at :127).

    ``join_constraint`` mirrors DataFusion's ON-vs-USING marker: it is
    semantically inert here (the ``on`` pairs already encode the
    keys), but the reference carries it field-for-field, so we do
    too — "on" | "using"."""

    left: Plan
    right: Plan
    on: tuple[tuple[str, str], ...]  # (left_col, right_col) pairs
    join_type: str = "inner"
    filter: str | None = None  # extra non-equi condition (l./r. qualified)
    null_equals_null: bool = False  # True → keys compare with <=>
    join_constraint: str = "on"  # "on" | "using" (mod.rs:127)

    def __init__(
        self, left, right, on, join_type="inner", filter=None,
        null_equals_null=False, join_constraint="on",
    ):
        if join_constraint not in ("on", "using"):
            raise ValueError(
                f"join_constraint must be 'on' or 'using', "
                f"got {join_constraint!r}"
            )
        object.__setattr__(self, "left", left)
        object.__setattr__(self, "right", right)
        object.__setattr__(self, "on", tuple((l, r) for l, r in on))
        object.__setattr__(self, "join_type", join_type)
        object.__setattr__(self, "filter", filter)
        object.__setattr__(self, "null_equals_null", null_equals_null)
        object.__setattr__(self, "join_constraint", join_constraint)

    @property
    def children(self) -> tuple[Plan, ...]:
        return (self.left, self.right)

    @property
    def exprs(self) -> tuple[str, ...]:
        op = "<=>" if self.null_equals_null else "="
        base = tuple(f"{l} {op} {r}" for l, r in self.on)
        return base + ((self.filter,) if self.filter else ())

    def rebuild(self, children):
        left, right = children
        return Join(
            left, right, self.on, self.join_type, self.filter,
            self.null_equals_null, self.join_constraint,
        )


@dataclass(frozen=True)
class CrossJoin(Plan):
    left: Plan
    right: Plan

    @property
    def children(self) -> tuple[Plan, ...]:
        return (self.left, self.right)

    def rebuild(self, children):
        left, right = children
        return CrossJoin(left, right)


@dataclass(frozen=True)
class Union(Plan):
    """UNION ALL with arbitrary fan-in (reference mod.rs:159-180)."""

    inputs: tuple[Plan, ...] = field(default_factory=tuple)

    def __init__(self, inputs):
        object.__setattr__(self, "inputs", tuple(inputs))

    @property
    def children(self) -> tuple[Plan, ...]:
        return self.inputs

    def rebuild(self, children):
        return Union(tuple(children))
