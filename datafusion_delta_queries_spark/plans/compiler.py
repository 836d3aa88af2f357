"""Compile the logical IR to DataFrames — full-snapshot and delta modes.

This is the layer the reference *stops short of*: its ``PosDeltaScan``
marker has no physical implementation (/root/reference/src/delta_node.rs
:63-109 defines only the logical node; SURVEY §0). We finish the job
the Spark-native way — every IR node compiles to a declarative
DataFrame op, so Catalyst/AQE own pushdown, pruning, join selection and
shuffle planning for the emitted plan.

Semantics (SURVEY §4.3, matching optimizer_rules/mod.rs:130-149):

- ``compile_plan(ir, catalog)``  — the FULL query over the *current*
  table state (old snapshot ∪ appended delta).
- ``compile_delta(ir, catalog)`` — rewrite ``PosDelta(ir)`` with the
  PosDelta rule, then compile with:
    * ``PosDeltaScan(T)`` → the appended-rows-only batch Δ T,
    * bare ``Scan(T)``    → the OLD snapshot (the un-delta'd join
      sides — ``join.left.clone()`` in the reference means the
      pre-update plan, so (old ⋈ Δ) ∪ (Δ ⋈ old) ∪ (Δ ⋈ Δ) equals
      new⋈new − old⋈old exactly on append-only inputs).

``DeltaCatalog`` models an append-only table version pair. Against the
parquet fixtures, the snapshot/delta split is a deterministic predicate
on the key column — both sides stay *filters over the same parquet
scan*, so predicate pushdown applies and no data is copied. Against a
real lakehouse table the same two methods would be ``versionAsOf`` time
travel (snapshot) and CDF insert-rows (delta); nothing above the
catalog changes.

At 100 TB: delta batches are small relative to the base table, so the
three join branches are naturally skewed — two of them join a huge
snapshot against a small Δ. AQE converts those to broadcast joins at
runtime (Δ under the threshold), which is exactly the physical plan
incremental maintenance wants; we deliberately do not hint.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .nodes import (
    CrossJoin,
    Filter,
    Join,
    Plan,
    PosDelta,
    PosDeltaScan,
    Projection,
    Scan,
    Union,
)
from .rewrite import rewrite_pos_delta

# Deterministic append-split predicates: rows matching the predicate are
# the "appended since the last maintained version" delta batch; the rest
# are the old snapshot. Chosen so every delta query below is non-empty
# at sf0.01. The DuckDB oracles replicate these predicates verbatim.
DELTA_PREDICATES: dict[str, str] = {
    "orders": "o_orderkey % 10 = 0",
    "customer": "c_custkey % 7 = 0",
    "supplier": "s_suppkey % 5 = 0",
    "nation": "n_nationkey >= 20",
    "region": "r_regionkey = 4",
    "lineitem": "l_orderkey % 10 = 0",
    "events": "event_id % 10 = 0",
    "documents": "doc_id % 9 = 0",
}


class DeltaCatalog:
    """Append-only version pair per table: old snapshot + insert delta.

    Parquet-fixture realization — predicate split over one scan. A
    Delta-Lake realization would override ``snapshot``/``delta`` with
    ``versionAsOf`` and CDF reads; the compiler is agnostic.
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        delta_predicates: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.delta_predicates = (
            DELTA_PREDICATES if delta_predicates is None else delta_predicates
        )

    def full(self, name: str) -> DataFrame:
        """Current table state (snapshot ∪ delta) — one plain scan."""
        return load_table(self.spark, self.sf_dir, name)

    def snapshot(self, name: str) -> DataFrame:
        """Old version: everything not in the delta batch."""
        pred = self.delta_predicates.get(name)
        df = self.full(name)
        return df.where(f"NOT ({pred})") if pred else df

    def delta(self, name: str) -> DataFrame:
        """Appended rows only (empty for tables with no registered split)."""
        pred = self.delta_predicates.get(name)
        df = self.full(name)
        return df.where(pred) if pred else df.where(F.lit(False))

    def versioned(self, name: str, version: int) -> DataFrame:
        """Time travel (SQL ``VERSION AS OF``). The plain parquet
        fixtures keep no version history; catalogs backed by versioned
        storage (sources/versioned.VersionedDeltaCatalog) override."""
        raise ValueError(
            f"{name} VERSION AS OF {version}: this catalog reads plain "
            f"parquet fixtures with no version history — use a "
            f"VersionedDeltaCatalog over VersionedTable storage"
        )


def _compile(node: Plan, scan, delta_scan) -> DataFrame:
    """Recursively compile an IR tree given leaf resolvers.

    ``scan`` receives the Scan NODE (it carries the optional pinned
    version); ``delta_scan`` receives a table name — a versioned leaf
    under a delta marker is refused before it gets there.
    """
    if isinstance(node, Scan):
        return scan(node)
    if isinstance(node, PosDeltaScan):
        if node.scan.version is not None:
            raise ValueError(
                f"PosDeltaScan over {node.scan.table} VERSION AS OF "
                f"{node.scan.version}: a pinned version has no delta — "
                f"maintain the current state or query the version "
                f"directly"
            )
        return delta_scan(node.scan.table)
    if isinstance(node, Projection):
        return _compile(node.input, scan, delta_scan).selectExpr(*node.select_exprs)
    if isinstance(node, Filter):
        return _compile(node.input, scan, delta_scan).where(node.predicate)
    if isinstance(node, Join):
        left = _compile(node.left, scan, delta_scan).alias("l")
        right = _compile(node.right, scan, delta_scan).alias("r")
        conds = [
            F.col(f"l.{lc}").eqNullSafe(F.col(f"r.{rc}"))
            if node.null_equals_null
            else F.col(f"l.{lc}") == F.col(f"r.{rc}")
            for lc, rc in node.on
        ]
        if node.filter:
            conds.append(F.expr(node.filter))
        if not conds:
            return left.crossJoin(right)
        cond = reduce(lambda a, b: a & b, conds)
        how = {"semi": "left_semi", "anti": "left_anti"}.get(
            node.join_type, node.join_type
        )
        return left.join(right, cond, how)
    if isinstance(node, CrossJoin):
        # Same l/r side aliases as keyed joins so expressions above a
        # cross join (SQL-frontend rewritten qualifiers) resolve sides.
        left = _compile(node.left, scan, delta_scan).alias("l")
        right = _compile(node.right, scan, delta_scan).alias("r")
        return left.crossJoin(right)
    if isinstance(node, Union):
        # Positional UNION ALL — the SQL semantic the reference's
        # LogicalPlan::Union has, and the only one that works when
        # rewrite-generated join branches carry duplicate column names
        # (both join sides owning an `address` column, say).
        dfs = [_compile(i, scan, delta_scan) for i in node.inputs]
        return reduce(lambda a, b: a.union(b), dfs)
    if isinstance(node, PosDelta):
        raise ValueError(
            "PosDelta wrapper reached the compiler — run rewrite_pos_delta "
            "first (compile_delta does this for you)"
        )
    raise TypeError(f"no compilation rule for {type(node).__name__}")


def scan_by_name(method):
    """Adapt a name-based leaf resolver to the Scan-node protocol.
    Pinned versions are refused: the caller has no versioned storage,
    and silently serving the CURRENT state for ``VERSION AS OF n``
    would be a wrong answer, not a degraded one."""

    def resolve(node: Scan) -> DataFrame:
        if node.version is not None:
            raise ValueError(
                f"{node.table} VERSION AS OF {node.version}: this "
                f"compilation path has no versioned storage"
            )
        return method(node.table)

    return resolve


def _leaf(catalog: "DeltaCatalog", method) -> "callable":
    """Scan-node resolver: current/old state via ``method``, pinned
    versions via the catalog's versioned storage (time travel)."""

    def resolve(node: Scan) -> DataFrame:
        if node.version is None:
            return method(node.table)
        return catalog.versioned(node.table, node.version)

    return resolve


def compile_plan(ir: Plan, catalog: DeltaCatalog) -> DataFrame:
    """Compile the FULL query over the current (post-append) state."""
    return _compile(ir, scan=_leaf(catalog, catalog.full), delta_scan=catalog.delta)


def compile_snapshot(ir: Plan, catalog: DeltaCatalog) -> DataFrame:
    """Compile the FULL query over the OLD (pre-append) snapshot."""
    return _compile(
        ir, scan=_leaf(catalog, catalog.snapshot), delta_scan=catalog.delta
    )


def compile_delta(ir: Plan, catalog: DeltaCatalog) -> DataFrame:
    """Rewrite to the positive-delta query and compile it.

    Accepts either a bare query (wrapped in PosDelta here) or an
    already-wrapped/already-rewritten plan. Raises ValueError when the
    rule declines (reference ``Ok(None)``, mod.rs:187) so callers never
    silently run a full query believing it incremental.
    """
    plan = ir if isinstance(ir, PosDelta) else PosDelta(ir)
    delta_ir = rewrite_pos_delta(plan)
    if delta_ir is None:
        raise ValueError(
            f"no positive-delta derivation for {plan.input.name} "
            "(reference optimizer_rules/mod.rs:187 returns None here)"
        )
    return _compile(
        delta_ir, scan=_leaf(catalog, catalog.snapshot), delta_scan=catalog.delta
    )
