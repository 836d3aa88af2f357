"""SQL surface extensions Spark SQL itself lacks: QUALIFY and
WITH RECURSIVE.

Both are real engine features a reference-engine user would expect
from a modern analytics SQL dialect (DuckDB, Snowflake, BigQuery ship
both; OSS Spark ships neither), and both compile onto plain Spark
plans — no new execution machinery:

- **QUALIFY** (window-predicate filter) rewrites textually into the
  equivalent windowed subquery: the predicate is computed as one extra
  boolean column inside the SELECT (where window functions are legal),
  the filter+drop happen at the DataFrame layer, and any trailing
  ORDER BY / LIMIT re-applies over a temp view. Catalyst sees exactly
  the Window → Filter plan a hand-written subquery would produce, so
  pushdown/pruning below the window are unchanged.

- **WITH RECURSIVE** executes by SEMINAIVE ITERATION, the textbook
  fixpoint strategy (each step joins only the NEW frontier from the
  previous iteration, never the accumulated result): the working table
  is registered as a temp view under the CTE's name, the step SELECT
  runs through ``spark.sql`` unmodified, and each frontier is
  ``localCheckpoint``-ed so lineage stays flat across iterations.
  UNION (distinct) semantics drop already-seen rows via a null-safe
  anti join — the SQL-standard working-table semantics, which also
  guarantee termination on cyclic graphs. UNION ALL keeps every row
  (linear recursion; the step's WHERE must bound depth — the iteration
  cap turns a runaway recursion into a loud error, same contract as
  DuckDB's). At 100 TB the frontier anti join is the scale lever:
  work per iteration ∝ |frontier| × |edges-touched|, never ∝
  |closure so far|; state unions are checkpointed frames, so the
  final plan is a flat union of materialized iterations.

Reference parity: none — the reference's SQL surface is the delta
fragment only (optimizer_rules/mod.rs registers five fixed SELECTs);
this is beyond-the-reference dialect surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sql_frontend import (
    UnsupportedSQL,
    _expr_text,
    _is_kw,
    _split_toplevel,
    _tokenize,
)

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")

# Names the recursive executor has registered as CTE temp views in
# this process — re-registering them is the executor's own idempotent
# re-run, not a clobber of user state.
_CTE_VIEW_NAMES: set[str] = set()


# -- QUALIFY ------------------------------------------------------------


def run_qualify_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute ``SELECT ... FROM ... [WHERE/GROUP BY/HAVING] QUALIFY
    <window-pred> [ORDER BY ...] [LIMIT n]``.

    The predicate is evaluated as a generated ``__qualify__`` column
    inside the SELECT list (window expressions are legal there), then
    filtered and dropped — semantically QUALIFY runs after windowing,
    exactly DuckDB/Snowflake's evaluation order. Tables must already
    be registered as views (``catalog.register_tables``)."""
    toks = _tokenize(sql)
    parts = _split_toplevel(toks, "qualify")
    if len(parts) == 1:
        raise UnsupportedSQL("no top-level QUALIFY clause")
    if len(parts) > 2:
        raise UnsupportedSQL("multiple QUALIFY clauses")
    head, rest = parts
    if not head or not _is_kw(head[0], "select"):
        raise UnsupportedSQL("QUALIFY requires a SELECT statement")
    if len(head) > 1 and _is_kw(head[1], "distinct"):
        raise UnsupportedSQL(
            "SELECT DISTINCT ... QUALIFY is not supported (the rewrite "
            "would add a column and change the distinct key)"
        )
    # Split trailing ORDER BY / LIMIT off the predicate.
    pred: list[str] = []
    tail: list[str] = []
    depth = 0
    for i, t in enumerate(rest):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        if depth == 0 and (_is_kw(t, "order") or _is_kw(t, "limit")):
            tail = rest[i:]
            break
        pred.append(t)
    if not pred:
        raise UnsupportedSQL("empty QUALIFY predicate")
    # Inject the predicate as a named boolean just before the
    # top-level FROM of the head.
    depth = 0
    from_idx = None
    for i, t in enumerate(head):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _is_kw(t, "from"):
            from_idx = i
            break
    if from_idx is None:
        raise UnsupportedSQL("QUALIFY requires a FROM clause")
    inner = (
        head[:from_idx]
        + [",", "(", *pred, ")", "as", "__qualify__"]
        + head[from_idx:]
    )
    df = (
        spark.sql(_expr_text(inner))
        .where(F.col("__qualify__"))
        .drop("__qualify__")
    )
    if tail:
        view = "__qualify_result__"
        df.createOrReplaceTempView(view)
        df = spark.sql(f"SELECT * FROM {view} {_expr_text(tail)}")
    return df


# -- WITH RECURSIVE -----------------------------------------------------


def _parse_ctes(toks: list[str]):
    """``WITH RECURSIVE name [(cols)] AS ( body ), ... final`` →
    ([(name, cols|None, body_tokens), ...], final_tokens)."""
    p = 0

    def expect(kw: str) -> None:
        nonlocal p
        if p >= len(toks) or not _is_kw(toks[p], kw):
            raise UnsupportedSQL(f"expected {kw.upper()} at token {p}")
        p += 1

    expect("with")
    expect("recursive")
    ctes = []
    while True:
        if p >= len(toks) or not _IDENT_RE.fullmatch(toks[p]):
            raise UnsupportedSQL("expected CTE name")
        name = toks[p]
        p += 1
        cols = None
        if p < len(toks) and toks[p] == "(":
            # column alias list — idents and commas until ')'
            close = toks.index(")", p)
            cols = [t for t in toks[p + 1 : close] if t != ","]
            if not all(_IDENT_RE.fullmatch(c) for c in cols):
                raise UnsupportedSQL(f"bad CTE column list for {name}")
            p = close + 1
        expect("as")
        if p >= len(toks) or toks[p] != "(":
            raise UnsupportedSQL(f"expected ( after {name} AS")
        depth = 0
        body_start = p + 1
        while p < len(toks):
            if toks[p] == "(":
                depth += 1
            elif toks[p] == ")":
                depth -= 1
                if depth == 0:
                    break
            p += 1
        if depth != 0:
            raise UnsupportedSQL(f"unbalanced parens in CTE {name}")
        ctes.append((name, cols, toks[body_start:p]))
        p += 1  # past ')'
        if p < len(toks) and toks[p] == ",":
            p += 1
            continue
        break
    final = toks[p:]
    if not final:
        raise UnsupportedSQL("WITH RECURSIVE needs a final SELECT")
    return ctes, final


def run_recursive_sql(
    spark: SparkSession, sql: str, max_iters: int = 200
) -> DataFrame:
    """Execute a restricted ``WITH RECURSIVE`` statement.

    Exactly one CTE may reference itself; its body must be
    ``<base> UNION [ALL] <step>``. Non-recursive CTEs in the list are
    registered as temp views in order (they may reference earlier
    ones). UNION = distinct accumulation + seminaive frontier (the
    SQL-standard working table: the step sees only rows NEW in the
    previous iteration); UNION ALL = linear recursion, frontier = the
    previous iteration's full output. ``max_iters`` bounds runaway
    recursion with a loud error."""
    ctes, final = _parse_ctes(_tokenize(sql))
    rec = [
        (name, cols, body)
        for name, cols, body in ctes
        if any(_is_kw(t, name.lower()) for t in body)
    ]
    if len(rec) != 1:
        raise UnsupportedSQL(
            f"exactly one self-referencing CTE required, found "
            f"{[n for n, _, _ in rec]}"
        )
    # Validate EVERY statement-shape constraint before touching any
    # session state: a raise past this block would otherwise leak CTE
    # names into _CTE_VIEW_NAMES (permanently disabling the shadow
    # guard below) and leave temp views shadowing catalog tables for
    # the rest of the session while run_extended_sql falls back to
    # plain spark.sql.
    name, cols, body = rec[0]
    halves = _split_toplevel(body, "union")
    if len(halves) != 2:
        raise UnsupportedSQL(
            "recursive CTE body must be <base> UNION [ALL] <step>"
        )
    base_toks, step_toks = halves
    distinct_mode = True
    if step_toks and _is_kw(step_toks[0], "all"):
        distinct_mode = False
        step_toks = step_toks[1:]
    # The executor materializes CTEs as temp views; a CTE whose name
    # shadows a FOREIGN table/view would silently REPLACE it for the
    # rest of the session (and a later fallback to spark.sql would run
    # against the clobbered catalog). Refuse loudly — but allow names
    # THIS executor registered (re-running the same statement in one
    # session must stay idempotent).
    for cte_name, _, _ in ctes:
        if (
            cte_name.lower() not in _CTE_VIEW_NAMES
            and spark.catalog.tableExists(cte_name)
        ):
            raise UnsupportedSQL(
                f"CTE name {cte_name!r} shadows an existing table/view; "
                "rename the CTE (this executor registers CTEs as "
                "session temp views)"
            )
    # Mutation starts here. Spark-side analysis of a non-recursive CTE
    # body can still fail (e.g. a typo'd column); roll back the names
    # and views THIS call introduced so a failed statement leaves the
    # session exactly as it found it.
    added = {
        n.lower() for n, _, _ in ctes if n.lower() not in _CTE_VIEW_NAMES
    }
    _CTE_VIEW_NAMES.update(added)
    # Snapshot executor-owned views this statement will REPLACE (a CTE
    # reusing a name an earlier statement registered): their resolved
    # plans are captured NOW so a later failure restores the prior
    # body, not just drops the new names (ADVICE r11).
    prior: dict[str, DataFrame] = {}
    for cte_name, _, _ in ctes:
        if cte_name.lower() not in added and spark.catalog.tableExists(
            cte_name
        ):
            prior[cte_name] = spark.table(cte_name)

    def _rollback() -> None:
        _CTE_VIEW_NAMES.difference_update(added)
        for v, _, _ in ctes:
            if v.lower() in added and spark.catalog.tableExists(v):
                spark.catalog.dropTempView(v)
        for v, df in prior.items():
            df.createOrReplaceTempView(v)

    try:
        for cte_name, cte_cols, cte_body in ctes:
            if (cte_name, cte_cols, cte_body) == rec[0]:
                continue
            df = spark.sql(_expr_text(cte_body))
            if cte_cols:
                df = df.toDF(*cte_cols)
            df.createOrReplaceTempView(cte_name)

        base = spark.sql(_expr_text(base_toks))
        if cols:
            base = base.toDF(*cols)
        out_cols = base.columns
        if distinct_mode:
            base = base.distinct()
        # Each iteration's output is localCheckpoint-ed (eager):
        # lineage stays one-union-deep no matter the iteration count,
        # and the emptiness probe reads materialized partitions.
        parts = [base.localCheckpoint(eager=True)]
        frontier = parts[0]
        step_sql = _expr_text(step_toks)

        def seen() -> DataFrame:
            acc = parts[0]
            for f in parts[1:]:
                acc = acc.unionByName(f)
            return acc

        for it in range(max_iters + 1):
            if it == max_iters:
                raise UnsupportedSQL(
                    f"recursion did not terminate within {max_iters} "
                    f"iterations — add a depth bound to the step's WHERE"
                )
            frontier.createOrReplaceTempView(name)
            new = spark.sql(step_sql)
            if cols:
                new = new.toDF(*cols)
            new = new.select(*out_cols)
            if distinct_mode:
                # Null-safe anti join against everything seen: a NULL
                # key must count as seen or a cyclic NULL row loops
                # forever. NO join hint here (r17 measured negative):
                # with a small accumulated set the planner already
                # broadcasts the seen side, and forcing shuffle_hash
                # replaced that free broadcast with a real exchange —
                # sql_reachability_closure 3.23 -> 3.52 s solo min.
                # The global-knob win this family showed came from the
                # step SQL's own joins, which AQE plans per statement.
                # r18 follow-up, also negative: scoping
                # preferSortMergeJoin=false around the iteration
                # actions (conf set/restore in this executor) measured
                # 2.54 -> 2.78/2.90 s solo min A/B/A on a quiet host —
                # the step's joins already broadcast at these sizes,
                # so the scope bought nothing and was reverted.
                s = seen().alias("s")
                n = new.distinct().alias("n")
                cond = None
                for c in out_cols:
                    eq = F.col(f"n.{c}").eqNullSafe(F.col(f"s.{c}"))
                    cond = eq if cond is None else cond & eq
                new = n.join(s, cond, "left_anti")
            new = new.localCheckpoint(eager=True)
            if new.isEmpty():
                break
            parts.append(new)
            frontier = new

        seen().createOrReplaceTempView(name)
        return spark.sql(_expr_text(final))
    except Exception:
        _rollback()
        raise


# -- ASOF JOIN ----------------------------------------------------------


def run_asof_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute ``SELECT ... FROM <lt> <la> ASOF [LEFT] JOIN <rt> <ra>
    ON <equi conjs AND one ts inequality> [WHERE/ORDER BY/LIMIT ...]``
    — DuckDB's ASOF JOIN dialect, compiled onto the generic
    ``functions.asof.asof_join`` operator (union + running-window:
    one shuffle on the keys, no pair blow-up).

    The inequality's direction picks the match: ``la.ts >= ra.ts`` →
    backward (latest right at-or-before), ``la.ts <= ra.ts`` →
    forward (earliest right at-or-after); operand order may be
    flipped. Aliases are required; the right side's non-key columns
    must not collide with left columns (alias them in a view first —
    same restriction the operator enforces loudly). Trailing clauses
    re-apply over the joined result via a temp view, with the ``la.``
    / ``ra.`` qualifiers stripped (every output column is unqualified
    after the join)."""
    from ..functions.asof import asof_join
    from .sql_frontend import _rewrite_quals

    toks = _tokenize(sql)
    if not toks or not _is_kw(toks[0], "select"):
        raise UnsupportedSQL("ASOF JOIN requires a SELECT statement")
    depth = 0
    from_idx = None
    for i, t in enumerate(toks):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _is_kw(t, "from"):
            from_idx = i
            break
    if from_idx is None:
        raise UnsupportedSQL("missing FROM")
    sel = toks[1:from_idx]
    p = from_idx + 1

    def take_ident(what: str) -> str:
        nonlocal p
        if p >= len(toks) or not _IDENT_RE.fullmatch(toks[p].split(".")[-1]):
            raise UnsupportedSQL(f"expected {what} at token {p}")
        t = toks[p]
        p += 1
        return t.split(".")[-1]

    def at_kw(kw: str) -> bool:
        # bounds-safe keyword check: a truncated statement must raise
        # UnsupportedSQL, never IndexError
        return p < len(toks) and _is_kw(toks[p], kw)

    lt = take_ident("left table")
    la = take_ident("left alias")
    if not at_kw("asof"):
        raise UnsupportedSQL("expected ASOF after the left relation")
    p += 1
    how = "left" if at_kw("left") else "inner"
    if how == "left":
        p += 1
    if not at_kw("join"):
        raise UnsupportedSQL("expected JOIN after ASOF")
    p += 1
    rt = take_ident("right table")
    ra = take_ident("right alias")
    if not at_kw("on"):
        raise UnsupportedSQL("expected ON")
    p += 1
    # conditions until a top-level trailing clause
    cond_toks: list[str] = []
    depth = 0
    while p < len(toks):
        t = toks[p]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        if depth == 0 and (
            _is_kw(t, "where") or _is_kw(t, "order") or _is_kw(t, "limit")
        ):
            break
        cond_toks.append(t)
        p += 1
    tail = toks[p:]

    def side_col(tok: str) -> tuple[str, str] | None:
        parts = tok.split(".")
        if len(parts) == 2 and parts[0] in (la, ra):
            return parts[0], parts[1]
        return None

    keys: list[tuple[str, str]] = []  # (left col, right col)
    ts_pair: tuple[str, str, str] | None = None  # (lcol, rcol, direction)
    for cond in _split_toplevel(cond_toks, "and"):
        if len(cond) != 3:
            raise UnsupportedSQL(
                f"ASOF ON conditions must be binary comparisons, got "
                f"{' '.join(cond)!r}"
            )
        a, op, b = cond
        sa, sb = side_col(a), side_col(b)
        if sa is None or sb is None or sa[0] == sb[0]:
            raise UnsupportedSQL(
                f"each ASOF ON condition must compare the two sides: "
                f"{' '.join(cond)!r}"
            )
        if sa[0] == ra:  # normalize to (left, op', right)
            sa, sb = sb, sa
            op = {"<=": ">=", ">=": "<=", "=": "="}.get(op, op)
        if op == "=":
            keys.append((sa[1], sb[1]))
        elif op in (">=", "<="):
            if ts_pair is not None:
                raise UnsupportedSQL("multiple ASOF inequalities")
            ts_pair = (
                sa[1],
                sb[1],
                "backward" if op == ">=" else "forward",
            )
        else:
            raise UnsupportedSQL(f"unsupported ASOF operator {op!r}")
    if ts_pair is None:
        raise UnsupportedSQL("ASOF JOIN needs exactly one ts inequality")
    if not keys:
        raise UnsupportedSQL("ASOF JOIN needs at least one equi key")

    left = spark.table(lt)
    right = spark.table(rt)
    for lcol, rcol in keys:
        if rcol != lcol:
            # withColumnRenamed would silently duplicate the name if
            # the right side already carries a distinct column lcol —
            # the downstream join would then fail with an opaque
            # ambiguity error (or bind the wrong column). Refuse
            # loudly, mirroring the ts-collision check below.
            if lcol in right.columns:
                raise UnsupportedSQL(
                    f"renaming right key {rcol} to {lcol} collides "
                    f"with an existing right column {lcol}; alias it "
                    "away in a view first"
                )
            right = right.withColumnRenamed(rcol, lcol)
    l_ts, r_ts, direction = ts_pair
    if r_ts in left.columns and r_ts != l_ts:
        raise UnsupportedSQL(
            f"right ts column {r_ts} collides with a left column"
        )
    joined = asof_join(
        left,
        right,
        keys=[k for k, _ in keys],
        left_ts=l_ts,
        right_ts=r_ts,
        how=how,
        direction=direction,
    )
    view = "__asof_result__"
    joined.createOrReplaceTempView(view)
    body = _rewrite_quals(sel, {la: "", ra: ""})
    tail_txt = _expr_text(_rewrite_quals(tail, {la: "", ra: ""}))
    return spark.sql(
        f"SELECT {_expr_text(body)} FROM {view} {tail_txt}"
    )


# -- PIVOT / UNPIVOT statements ------------------------------------------
#
# DuckDB's simplified PIVOT/UNPIVOT statement forms, compiled onto
# Spark's native relational pivot/unpivot (RelationalGroupedDataset
# .pivot / Dataset.unpivot — both JVM-side, whole-stage-codegen'd):
#
#   PIVOT <dataset> ON <col> USING <agg>(<expr>) [GROUP BY c1, c2, ...]
#   UNPIVOT <dataset> ON c1, c2, ... INTO NAME <n> VALUE <v>
#
# <dataset> is a registered table/view name or a parenthesized
# statement that routes back through run_extended_sql — so
# UNPIVOT (PIVOT t ON ...) ON ... composes, like DuckDB.
#
# Without GROUP BY, DuckDB groups by every column not consumed by the
# ON column or the USING aggregate — mirrored here from the dataset's
# schema. The pivot VALUE LIST is collected first (sorted distinct of
# the ON column — bounded by construction: a pivot's width IS its
# output schema, so this collect is O(result columns), never O(data));
# passing explicit values lets Spark skip its own discovery job and
# keeps the output schema deterministic.


def _unquote_ident(tok: str) -> str:
    if len(tok) >= 2 and tok[0] == '"' and tok[-1] == '"':
        return tok[1:-1].replace('""', '"')
    return tok


def _parse_dataset(
    spark: SparkSession, toks: list[str], p: int, workspace: str | None
) -> tuple[DataFrame, int]:
    """Parse <table-name> or ( <statement> ) at position p."""
    if p < len(toks) and toks[p] == "(":
        depth = 1
        q = p + 1
        while q < len(toks) and depth:
            if toks[q] == "(":
                depth += 1
            elif toks[q] == ")":
                depth -= 1
            q += 1
        if depth:
            raise UnsupportedSQL("unbalanced parens in dataset")
        inner = _expr_text(toks[p + 1 : q - 1])
        return run_extended_sql(spark, inner, workspace), q
    name = toks[p] if p < len(toks) else ""
    if not _IDENT_RE.fullmatch(name):
        raise UnsupportedSQL(f"expected a table name or ( query ), got {name!r}")
    return spark.table(name), p + 1


def run_pivot_sql(
    spark: SparkSession, sql: str, workspace: str | None = None
) -> DataFrame:
    """Execute DuckDB's simplified ``PIVOT`` statement on Spark."""
    toks = _tokenize(sql)
    if not toks or not _is_kw(toks[0], "pivot"):
        raise UnsupportedSQL("not a PIVOT statement")
    df, p = _parse_dataset(spark, toks, 1, workspace)
    if p >= len(toks) or not _is_kw(toks[p], "on"):
        raise UnsupportedSQL("PIVOT needs ON <column>")
    on_col = _unquote_ident(toks[p + 1])
    if on_col not in df.columns:
        raise UnsupportedSQL(f"PIVOT ON column {on_col!r} not in dataset")
    p += 2
    if p >= len(toks) or not _is_kw(toks[p], "using"):
        raise UnsupportedSQL("PIVOT needs USING <aggregate>")
    p += 1
    agg_toks: list[str] = []
    depth = 0
    while p < len(toks):
        t = toks[p]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        if depth == 0 and _is_kw(t, "group"):
            break
        agg_toks.append(t)
        p += 1
    agg_text = _expr_text(agg_toks)
    if not agg_text:
        raise UnsupportedSQL("empty USING aggregate")
    groups: list[str]
    if p < len(toks):
        if not (
            p + 1 < len(toks)
            and _is_kw(toks[p], "group")
            and _is_kw(toks[p + 1], "by")
        ):
            raise UnsupportedSQL(f"unexpected token {toks[p]!r} after USING")
        groups = []
        for part in _split_toplevel(toks[p + 2 :], ","):
            if len(part) != 1 or not _IDENT_RE.fullmatch(_unquote_ident(part[0])):
                raise UnsupportedSQL("GROUP BY entries must be bare columns")
            groups.append(_unquote_ident(part[0]))
    else:
        # DuckDB default: group by everything the pivot doesn't consume.
        used = {on_col} | {
            t for t in agg_toks if t in set(df.columns)
        }
        groups = [c for c in df.columns if c not in used]
    # Bounded collect: the distinct ON values ARE the output columns,
    # so cardinality is inherently the output width — but make the
    # bound EXPLICIT: fetch limit+1 and refuse loudly rather than
    # letting a mis-chosen pivot column (e.g. a timestamp) build a
    # million-column frame and OOM the driver.
    _PIVOT_MAX = 10_000  # Spark's own spark.sql.pivotMaxValues default
    fetched = (
        df.select(on_col).distinct().limit(_PIVOT_MAX + 1).collect()
    )
    if len(fetched) > _PIVOT_MAX:
        raise UnsupportedSQL(
            f"PIVOT ON {on_col} has more than {_PIVOT_MAX} distinct "
            "values — each becomes an output COLUMN; pivot on a "
            "low-cardinality column or pre-bucket this one"
        )
    values = sorted(r[0] for r in fetched if r[0] is not None)
    return df.groupBy(*groups).pivot(on_col, values).agg(F.expr(agg_text))


def run_unpivot_sql(
    spark: SparkSession, sql: str, workspace: str | None = None
) -> DataFrame:
    """Execute DuckDB's simplified ``UNPIVOT`` statement on Spark."""
    toks = _tokenize(sql)
    if not toks or not _is_kw(toks[0], "unpivot"):
        raise UnsupportedSQL("not an UNPIVOT statement")
    df, p = _parse_dataset(spark, toks, 1, workspace)
    if p >= len(toks) or not _is_kw(toks[p], "on"):
        raise UnsupportedSQL("UNPIVOT needs ON <columns>")
    p += 1
    on_toks: list[str] = []
    while p < len(toks) and not _is_kw(toks[p], "into"):
        on_toks.append(toks[p])
        p += 1
    on_cols = []
    for part in _split_toplevel(on_toks, ","):
        if len(part) != 1:
            raise UnsupportedSQL(
                "UNPIVOT ON entries must be bare column names"
            )
        on_cols.append(_unquote_ident(part[0]))
    missing = [c for c in on_cols if c not in df.columns]
    if missing:
        raise UnsupportedSQL(f"UNPIVOT ON columns not in dataset: {missing}")
    if (
        p + 4 >= len(toks)
        or not _is_kw(toks[p], "into")
        or not _is_kw(toks[p + 1], "name")
        or not _is_kw(toks[p + 3], "value")
    ):
        raise UnsupportedSQL("UNPIVOT needs INTO NAME <col> VALUE <col>")
    name_col = _unquote_ident(toks[p + 2])
    value_col = _unquote_ident(toks[p + 4])
    if toks[p + 5 :]:
        raise UnsupportedSQL("trailing tokens after UNPIVOT INTO clause")
    ids = [c for c in df.columns if c not in set(on_cols)]
    return df.unpivot(ids, on_cols, name_col, value_col)


# -- RESTORE TABLE ... TO VERSION AS OF n ---------------------------------


def run_restore_sql(spark: SparkSession, sql: str, tables: dict) -> DataFrame:
    """Delta's ``RESTORE TABLE <t> TO VERSION AS OF <n>`` statement
    over the CDF substrate: parse, dispatch to
    ``CdfVersionedTable.restore`` (a roll-forward repair commit — see
    its docstring), and return the one-row metrics frame Delta's
    RESTORE returns (table, restored-to version, new commit).
    ``tables`` binds statement names to ``CdfVersionedTable`` handles
    — version stores live outside the temp-view catalog."""
    toks = _tokenize(sql)
    if (
        len(toks) != 8
        or not _is_kw(toks[0], "restore")
        or not _is_kw(toks[1], "table")
        or not _is_kw(toks[3], "to")
        or not _is_kw(toks[4], "version")
        or not _is_kw(toks[5], "as")
        or not _is_kw(toks[6], "of")
    ):
        raise UnsupportedSQL(
            "expected RESTORE TABLE <name> TO VERSION AS OF <n>"
        )
    name = toks[2]
    if name not in tables:
        raise UnsupportedSQL(f"RESTORE: unknown versioned table {name!r}")
    if not toks[7].isdigit():
        raise UnsupportedSQL(f"RESTORE needs an integer version, got {toks[7]!r}")
    version = int(toks[7])
    new_v = tables[name].restore(spark, version)
    return spark.createDataFrame(
        [(name, version, new_v)],
        "table_name string, restored_to_version bigint, commit_version bigint",
    )


def run_shallow_clone_sql(
    spark: SparkSession,
    sql: str,
    tables: dict,
    workspace: str,
) -> DataFrame:
    """Delta's ``CREATE TABLE <dst> SHALLOW CLONE <src>
    [VERSION AS OF <n>]`` over the CDF substrate: a zero-copy fork
    (see ``sources.versioned.ShallowCloneTable``). ``tables`` binds
    statement names to ``CdfVersionedTable`` handles; the new clone
    handle is registered under ``<dst>`` so later statements (DML,
    RESTORE, time travel) can target it. Returns Delta's one-row
    clone metrics frame — and on this substrate ``copied_files_size``
    is ZERO by construction, which the frame states explicitly."""
    import os

    from ..sources.versioned import ShallowCloneTable

    toks = _tokenize(sql)
    if (
        len(toks) < 6
        or not _is_kw(toks[0], "create")
        or not _is_kw(toks[1], "table")
        or not _is_kw(toks[3], "shallow")
        or not _is_kw(toks[4], "clone")
    ):
        raise UnsupportedSQL(
            "expected CREATE TABLE <dst> SHALLOW CLONE <src> "
            "[VERSION AS OF <n>]"
        )
    dst, src = toks[2], toks[5]
    for name in (dst, src):
        if not _IDENT_RE.fullmatch(name):
            raise UnsupportedSQL(f"bad table name {name!r}")
    if src not in tables:
        raise UnsupportedSQL(f"SHALLOW CLONE: unknown versioned table {src!r}")
    if dst in tables:
        raise UnsupportedSQL(f"SHALLOW CLONE: target {dst!r} already bound")
    version = None
    rest = toks[6:]
    if rest:
        if not (
            len(rest) == 4
            and _is_kw(rest[0], "version")
            and _is_kw(rest[1], "as")
            and _is_kw(rest[2], "of")
            and rest[3].isdigit()
        ):
            raise UnsupportedSQL(
                f"trailing tokens after SHALLOW CLONE: {' '.join(rest)!r} "
                "(only VERSION AS OF <n> is supported)"
            )
        version = int(rest[3])
    clone = ShallowCloneTable.create(
        tables[src], os.path.join(workspace, dst), version
    )
    tables[dst] = clone
    return spark.createDataFrame(
        [(dst, src, clone._as_of, 0, 0)],
        "table_name string, source_table_name string, "
        "source_version bigint, copied_files_count bigint, "
        "copied_files_size bigint",
    )


def _read_copy_ledger(path: str) -> tuple[set[str], dict | None]:
    """Loaded-file set + pending intent (or None) from the sidecar.
    Legacy ledgers (a bare JSON list, pre-intent format) migrate to
    (set, no pending) transparently."""
    import json
    import os

    if not os.path.exists(path):
        return set(), None
    with open(path, encoding="ascii") as fh:
        raw = json.load(fh)
    if isinstance(raw, list):  # legacy: list of loaded names
        return set(raw), None
    return set(raw["loaded"]), raw.get("pending")


def _write_copy_ledger(
    path: str, loaded: set[str], pending: dict | None
) -> None:
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w", encoding="ascii") as fh:
        json.dump({"loaded": sorted(loaded), "pending": pending}, fh)
    os.replace(tmp, path)


def run_copy_into_sql(
    spark: SparkSession, sql: str, tables: dict
) -> DataFrame:
    """Delta's ``COPY INTO <t> FROM '<dir>' [FILEFORMAT = PARQUET]`` —
    idempotent, exactly-once FILE-level ingest: every source file
    loads at most once, ever, no matter how many times the statement
    re-runs (the production ingestion contract — a nightly job can
    crash and re-run without double-loading). The loaded-file ledger
    is a JSON sidecar next to the target's root (``<root>.copy_ledger``
    — file NAMES only, O(#files) driver metadata, never data).

    Exactly-once holds across a crash at ANY point via write-ahead
    intent: before committing, the run records ``pending = {files,
    version}`` in the ledger (atomic tmp+rename), THEN commits, THEN
    promotes pending → loaded. Every run first reconciles a leftover
    pending entry against the committed history: if the recorded
    version dir exists with a ``_SUCCESS`` marker the commit was
    durable and the files promote WITHOUT re-reading (a crash after
    commit but before promotion can no longer double-load — the gap a
    commit-then-record ordering leaves open); a partial dir (no
    ``_SUCCESS``) is a torn commit and is rolled back so the files
    retry cleanly. Returns Delta's metrics frame (files_loaded,
    rows_loaded, commit_version — NULL version when nothing new).
    ``tables`` binds names to ``CdfVersionedTable`` handles, like
    RESTORE/SHALLOW CLONE."""
    import os
    import shutil

    toks = _tokenize(sql)
    if (
        len(toks) < 5
        or not _is_kw(toks[0], "copy")
        or not _is_kw(toks[1], "into")
        or not _is_kw(toks[3], "from")
    ):
        raise UnsupportedSQL(
            "expected COPY INTO <table> FROM '<dir>' [FILEFORMAT = <fmt>]"
        )
    name = toks[2]
    if name not in tables:
        raise UnsupportedSQL(f"COPY INTO: unknown versioned table {name!r}")
    raw = toks[4]
    if not (raw.startswith("'") and raw.endswith("'")):
        raise UnsupportedSQL("COPY INTO FROM needs a quoted directory path")
    src_dir = raw[1:-1]
    rest = toks[5:]
    fmt = "parquet"
    if rest:
        if not (
            len(rest) == 3
            and _is_kw(rest[0], "fileformat")
            and rest[1] == "="
        ):
            raise UnsupportedSQL(
                f"trailing tokens after COPY INTO: {' '.join(rest)!r}"
            )
        fmt = rest[2].lower()
        if fmt != "parquet":
            raise UnsupportedSQL(f"COPY INTO supports PARQUET, got {fmt!r}")
    if not os.path.isdir(src_dir):
        raise UnsupportedSQL(f"COPY INTO source dir {src_dir!r} not found")

    vt = tables[name]
    ledger_path = vt.root.rstrip("/") + ".copy_ledger"
    loaded, pending = _read_copy_ledger(ledger_path)
    if pending is not None:
        # reconcile a prior run's write-ahead intent against the
        # committed history (the crash-recovery path)
        vdir = vt._version_dir(int(pending["version"]))
        if os.path.exists(os.path.join(vdir, "_SUCCESS")):
            # the commit was durable; the crash hit before promotion —
            # promote without re-reading (this is the double-load gap)
            loaded |= set(pending["files"])
        elif os.path.isdir(vdir):
            # torn commit (dir without _SUCCESS): roll it back so the
            # pending files retry as new
            shutil.rmtree(vdir)
        _write_copy_ledger(ledger_path, loaded, None)
    on_disk = sorted(
        f for f in os.listdir(src_dir) if f.endswith(".parquet")
    )
    new = [f for f in on_disk if f not in loaded]
    if not new:
        return spark.createDataFrame(
            [(name, 0, 0, None)],
            "table_name string, files_loaded bigint, rows_loaded bigint, "
            "commit_version bigint",
        )
    from pyspark.sql import functions as F

    batch = spark.read.parquet(
        *[os.path.join(src_dir, f) for f in new]
    ).withColumn("_change_type", F.lit("insert"))
    n_rows = batch.count()
    # write-ahead: intent first (atomic), then the commit, then the
    # promotion — a crash in any gap reconciles correctly on rerun
    version = vt.next_version()
    _write_copy_ledger(
        ledger_path, loaded, {"files": sorted(new), "version": version}
    )
    committed = vt.write_version(batch, version=version)
    _write_copy_ledger(ledger_path, loaded | set(new), None)
    return spark.createDataFrame(
        [(name, len(new), n_rows, committed)],
        "table_name string, files_loaded bigint, rows_loaded bigint, "
        "commit_version bigint",
    )


# -- SELECT * EXCLUDE / REPLACE ------------------------------------------


def run_star_modifiers_sql(
    spark: SparkSession, sql: str, workspace: str | None = None
) -> DataFrame:
    """DuckDB's star modifiers: ``SELECT * EXCLUDE (a, b) FROM t`` and
    ``SELECT * REPLACE (expr AS col) FROM t`` — rewritten textually
    into an explicit column list resolved from the FROM relation's
    catalog schema, then executed by Spark unchanged. The rewrite is
    pure projection surgery: pushdown, pruning, and everything after
    the SELECT list are untouched. v1 scope: a single star at the head
    of the SELECT list over a single named FROM relation."""
    toks = _tokenize(sql)
    if not toks or not _is_kw(toks[0], "select"):
        raise UnsupportedSQL("star modifiers need a SELECT statement")
    if not toks[1] == "*":
        raise UnsupportedSQL("expected SELECT * EXCLUDE/REPLACE")
    p = 2
    excluded: list[str] = []
    replaced: dict[str, str] = {}
    replace_order: list[str] = []
    while p < len(toks) and (
        _is_kw(toks[p], "exclude") or _is_kw(toks[p], "replace")
    ):
        kind = toks[p].lower()
        p += 1
        if p >= len(toks) or toks[p] != "(":
            raise UnsupportedSQL(f"{kind.upper()} needs a parenthesized list")
        depth = 1
        q = p + 1
        while q < len(toks) and depth:
            if toks[q] == "(":
                depth += 1
            elif toks[q] == ")":
                depth -= 1
            q += 1
        if depth:
            raise UnsupportedSQL(f"unbalanced parens in {kind.upper()}")
        inner = toks[p + 1 : q - 1]
        for part in _split_toplevel(inner, ","):
            if kind == "exclude":
                if len(part) != 1:
                    raise UnsupportedSQL("EXCLUDE entries must be bare columns")
                excluded.append(_unquote_ident(part[0]))
            else:
                if len(part) < 3 or not _is_kw(part[-2], "as"):
                    raise UnsupportedSQL(
                        "REPLACE entries must be <expr> AS <col>"
                    )
                col = _unquote_ident(part[-1])
                replaced[col] = _expr_text(part[:-2])
                replace_order.append(col)
        p = q
    if not excluded and not replaced:
        raise UnsupportedSQL("no EXCLUDE/REPLACE modifier found")
    rest = toks[p:]
    if not rest or not _is_kw(rest[0], "from"):
        raise UnsupportedSQL("star modifiers need FROM <table> directly")
    table = rest[1] if len(rest) > 1 else ""
    if not _IDENT_RE.fullmatch(table):
        raise UnsupportedSQL("star modifiers v1 support a single named table")
    cols = spark.table(table).columns
    unknown = [c for c in excluded if c not in cols] + [
        c for c in replaced if c not in cols
    ]
    if unknown:
        raise UnsupportedSQL(f"EXCLUDE/REPLACE names not in {table}: {unknown}")
    items = [
        f"{replaced[c]} AS {c}" if c in replaced else c
        for c in cols
        if c not in set(excluded)
    ]
    dropped_replaces = [c for c in replace_order if c in set(excluded)]
    if dropped_replaces:
        raise UnsupportedSQL(
            f"REPLACE on excluded columns: {dropped_replaces}"
        )
    return spark.sql(f"SELECT {', '.join(items)} {_expr_text(rest)}")


# -- statement dispatcher ----------------------------------------------


def run_extended_sql(
    spark: SparkSession, sql: str, workspace: str | None = None
) -> DataFrame:
    """One entry point for the extended dialect: routes a statement to
    the right executor by shape, falling back to ``spark.sql`` for
    anything Spark handles natively.

    - ``WITH RECURSIVE ...``      → ``run_recursive_sql`` (only when
      the recursion is UNION-distinct, which native Spark rejects —
      UNION ALL recursion falls through to Spark's own support);
    - top-level ``QUALIFY``       → ``run_qualify_sql``;
    - top-level ``ASOF ... JOIN`` → ``run_asof_sql``;
    - ``PIVOT`` / ``UNPIVOT`` statements → ``run_pivot_sql`` /
      ``run_unpivot_sql`` (DuckDB's simplified forms);
    - ``SELECT * EXCLUDE/REPLACE (...)`` → ``run_star_modifiers_sql``;
    - ``CREATE TABLE t AS SELECT``→ materialize under ``workspace``,
      register as a view, return the written rows' count frame;
    - ``COPY ( SELECT ... ) TO 'path' (FORMAT fmt)`` → export;
    - anything else              → ``spark.sql`` unchanged.
    """
    toks = _tokenize(sql)
    if not toks:
        raise UnsupportedSQL("empty statement")
    if _is_kw(toks[0], "pivot"):
        return run_pivot_sql(spark, sql, workspace)
    if _is_kw(toks[0], "unpivot"):
        return run_unpivot_sql(spark, sql, workspace)
    if (
        _is_kw(toks[0], "select")
        and len(toks) > 2
        and toks[1] == "*"
        and (_is_kw(toks[2], "exclude") or _is_kw(toks[2], "replace"))
    ):
        return run_star_modifiers_sql(spark, sql, workspace)
    if _is_kw(toks[0], "with") and len(toks) > 1 and _is_kw(
        toks[1], "recursive"
    ):
        # Route to the seminaive executor only for UNION-distinct
        # recursion; Spark 4 handles UNION ALL recursion natively.
        try:
            return run_recursive_sql(spark, sql)
        except UnsupportedSQL:
            return spark.sql(sql)
    if _is_kw(toks[0], "create"):
        return _run_ctas(spark, toks, workspace)
    if _is_kw(toks[0], "copy"):
        return _run_copy_to(spark, toks)
    depth = 0
    has_qualify = False
    has_asof = False
    for t in toks:
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and _is_kw(t, "qualify"):
            has_qualify = True
        elif depth == 0 and _is_kw(t, "asof"):
            has_asof = True
    if has_qualify:
        return run_qualify_sql(spark, sql)
    if has_asof:
        return run_asof_sql(spark, sql)
    return spark.sql(sql)


def _run_ctas(
    spark: SparkSession, toks: list[str], workspace: str | None
) -> DataFrame:
    """``CREATE TABLE <name> AS SELECT ...`` — materialize the SELECT
    as parquet under the workspace and register the written files as
    a view (reads after the CTAS see the MATERIALIZED rows, not a
    live recomputation — the lakehouse CTAS contract)."""
    import os

    if workspace is None:
        raise UnsupportedSQL(
            "CREATE TABLE AS SELECT needs a workspace directory"
        )
    p = 1
    if p < len(toks) and _is_kw(toks[p], "table"):
        p += 1
    else:
        raise UnsupportedSQL("expected CREATE TABLE")
    name = toks[p]
    if not _IDENT_RE.fullmatch(name):
        raise UnsupportedSQL(f"bad table name {name!r}")
    p += 1
    if p >= len(toks) or not _is_kw(toks[p], "as"):
        raise UnsupportedSQL("expected AS SELECT in CTAS")
    body = _expr_text(toks[p + 1 :])
    path = os.path.join(workspace, name)
    if os.path.exists(path):
        raise UnsupportedSQL(f"table {name} already exists at {path}")
    # the body composes through the dispatcher, so CTAS can
    # materialize a QUALIFY / ASOF / recursive result directly
    run_extended_sql(spark, body, workspace).write.parquet(path)
    out = spark.read.parquet(path)
    out.createOrReplaceTempView(name)
    return out

def _run_copy_to(spark: SparkSession, toks: list[str]) -> DataFrame:
    """``COPY ( SELECT ... ) TO '<path>' ( FORMAT <parquet|csv|json> )``
    — DuckDB's export statement; returns a 1-row frame with the
    exported row count."""
    from pyspark.sql import functions as F

    p = 1
    if p >= len(toks) or toks[p] != "(":
        raise UnsupportedSQL("expected COPY ( SELECT ... )")
    depth = 1
    body: list[str] = []
    p += 1
    while p < len(toks) and depth:
        if toks[p] == "(":
            depth += 1
        elif toks[p] == ")":
            depth -= 1
            if depth == 0:
                break
        body.append(toks[p])
        p += 1
    if depth:
        raise UnsupportedSQL("unbalanced parens in COPY")
    p += 1
    if p >= len(toks) or not _is_kw(toks[p], "to"):
        raise UnsupportedSQL("expected TO after COPY ( ... )")
    p += 1
    raw = toks[p]
    if not (raw.startswith("'") and raw.endswith("'")):
        raise UnsupportedSQL("COPY TO needs a quoted path")
    path = raw[1:-1]
    p += 1
    fmt = "parquet"
    if p < len(toks):
        if (
            p + 3 >= len(toks)
            or toks[p] != "("
            or not _is_kw(toks[p + 1], "format")
            or toks[p + 3] != ")"
        ):
            raise UnsupportedSQL("expected ( FORMAT <fmt> ) after path")
        fmt = toks[p + 2].lower()
        if fmt not in ("parquet", "csv", "json", "orc"):
            raise UnsupportedSQL(f"unsupported COPY format {fmt!r}")
    df = spark.sql(_expr_text(body))
    w = df.write.format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)
    n = spark.read.format(fmt).options(
        **({"header": True, "inferSchema": True} if fmt == "csv" else {})
    ).load(path).count()
    return spark.range(1).select(
        F.lit(path).alias("path"),
        F.lit(fmt).alias("format"),
        F.lit(n).cast("bigint").alias("n_rows"),
    )
