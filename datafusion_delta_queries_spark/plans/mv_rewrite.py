"""Materialized-view query rewrite — answer a GROUP BY from a stored
aggregate instead of the base table(s).

Covers single-table MVs, JOIN-backed MVs, and FILTERED MVs: a
candidate whose join fragment matches the MV definition
token-for-token (normalized — ``_fragment_parts``) — or, for
INNER-only equi-join chains, matches after deterministic
canonicalization of join order and table aliases
(``_canonical_join_signature``; both sides canonicalized with the
same rule, never fuzzy-matched) — and whose WHERE
conjunctively implies the view's (every view conjunct present
token-identically; residual conjuncts key-only) is served from the
store. Qualified column refs in candidate keys/filters count their
qualifier as a column and so refuse unless the MV stores it — the
refuse direction, never a wrong rewrite.

The classic warehouse optimization (Calcite/DataFusion-style MV
substitution, the ANSWER half of the repo's continuous-aggregate
family: ``operators/continuous_agg.py`` maintains stored partials,
this module lets an arbitrary matching query be SERVED from them):
a query whose grouping keys are expressions over the MV's keys, whose
filter references only MV key columns, and whose aggregates are
derivable from the MV's stored partials is rewritten to scan the
MV — at 100 TB that is reading a few thousand pre-aggregated rows
instead of the fact table. Derivability is decided conservatively
and REFUSED loudly (return ``None``) whenever the rewrite could not
be exact — e.g. ``count(DISTINCT …)`` is not derivable from partial
counts, and a filter over a non-key column would need base rows the
MV already collapsed.

Derivation rules (the standard re-aggregation algebra):

- ``count(*)``  → ``sum(mv.count_partial)``
- ``count(x)``  → ``sum(mv.count_x_partial)`` (same normalized arg)
- ``sum(x)``    → ``sum(mv.sum_x_partial)``
- ``min(x)``    → ``min(mv.min_x_partial)``   (min is re-minimizable)
- ``max(x)``    → ``max(mv.max_x_partial)``
- ``avg(x)``    → ``sum(sum_x) / sum(count_x)`` — requires the MV to
  store BOTH partials (count with the SAME arg, so SQL null
  semantics carry over exactly)

Reuses ``parse_join_agg_sql`` (plans/sql_frontend.py) for both the
view definition and the candidate query, so the accepted grammar is
the same as the maintained-aggregate SQL surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .sql_frontend import UnsupportedSQL, parse_join_agg_sql

# Tokens that may appear as bare (non-function) identifiers inside key
# expressions and filters without referencing a column. Deliberately
# MINIMAL: interval-unit words (day/month/…) are NOT here, because a
# real column named `day` masked by the list would let a non-key
# filter through and produce a silently-wrong rewrite — treating them
# as columns errs in the refuse direction, which is the safe one
# (an `INTERVAL 1 DAY` filter just falls back to the base table).
_NON_COLUMN_WORDS = {
    "and", "or", "not", "in", "is", "null", "between", "like",
    "case", "when", "then", "else", "end", "as", "true", "false",
    "distinct", "interval",
    "bigint", "int", "integer", "double", "float", "string",
    "varchar", "date", "timestamp", "decimal", "boolean",
}


def _column_refs(expr: str) -> set[str]:
    """Bare column identifiers referenced by ``expr`` — function names
    (identifier followed by ``(``) and keyword/type words excluded;
    string literals stripped first so quoted text never looks like a
    column."""
    stripped = re.sub(r"'[^']*'", "''", expr)
    out: set[str] = set()
    for m in re.finditer(r"[A-Za-z_][A-Za-z_0-9]*", stripped):
        tail = stripped[m.end():].lstrip()
        if tail.startswith("("):
            continue  # function call
        word = m.group(0)
        if word.lower() in _NON_COLUMN_WORDS:
            continue
        out.add(word)
    return out


def _fragment_parts(
    fragment_sql: str,
) -> tuple[str, str | None, list[str], str | None]:
    """(normalized join core, where_pred, table_names, canonical
    signature) of a fragment emitted by ``parse_join_agg_sql``.

    The core is the token sequence from the top-level FROM up to (not
    including) a top-level WHERE, lowercased token-by-token —
    EXCLUDING quoted string literals, whose case is semantic: two ON
    clauses differing only in a literal's case must NOT normalize to
    the same core, or a case-differing join would be served from the
    wrong MV. Matching is exact token equality of cores, with one
    widening: INNER-only equi-join chains also get a deterministic
    canonical signature (``_canonical_join_signature`` — table-sorted,
    alias-erased, predicate-set-sorted), so the SAME join written in a
    different order or under different aliases still matches. Any
    shape the canonicalizer is not certain about (outer/cross joins,
    subqueries, non-equality ON terms, self-joins) yields ``None`` and
    falls back to the exact-token rule — conservative by construction
    (a fragment that cannot be proven equal falls back to the base
    tables, never rewrites wrong)."""
    from .sql_frontend import _tokenize

    toks = _tokenize(fragment_sql)
    depth = 0
    from_i: int | None = None
    where_i: int | None = None
    for i, t in enumerate(toks):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and from_i is None and t.lower() == "from":
            from_i = i
        elif depth == 0 and from_i is not None and t.lower() == "where":
            where_i = i
            break
    if from_i is None:
        raise UnsupportedSQL(f"no FROM in fragment {fragment_sql!r}")
    core_toks = toks[from_i : where_i if where_i is not None else len(toks)]
    where = (
        " ".join(toks[where_i + 1 :]) if where_i is not None else None
    )
    core = " ".join(
        t if t.startswith("'") else t.lower() for t in core_toks
    )
    # table names: the identifier after each top-level FROM/JOIN
    tables = []
    d = 0
    for i, t in enumerate(core_toks):
        if t == "(":
            d += 1
        elif t == ")":
            d -= 1
        elif d == 0 and t.lower() in ("from", "join") and i + 1 < len(
            core_toks
        ):
            tables.append(core_toks[i + 1].lower())
    return core, where, tables, _canonical_join_signature(core_toks)


_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*(\.[A-Za-z_][A-Za-z_0-9]*)?")
_LITERAL_RE = re.compile(r"'[^']*'|\d+(\.\d+)?")


def _canonical_join_signature(core_toks: list[str]) -> str | None:
    """Deterministic order/alias-independent signature of an
    INNER-only equi-join chain, or ``None`` when the fragment is not
    provably canonicalizable (the caller then matches exact tokens
    only — the refuse direction).

    Inner joins are a cross product plus a conjunctive filter, so the
    multiset of tables plus the SET of ON conjuncts identifies the
    fragment regardless of join order or table aliases. Accepted
    grammar: ``FROM t [[AS] a] (JOIN t [[AS] a] ON eq (AND eq)*)*``
    with each ``eq`` exactly ``side = side`` (identifier or literal
    sides). Anything else — outer/cross/natural joins, parentheses,
    subqueries, USING, comma joins, duplicate table names (self-join:
    alias erasure would conflate the two sides) — returns None."""
    toks = [t if t.startswith("'") else t.lower() for t in core_toks]
    if not toks or toks[0] != "from" or "(" in toks:
        return None
    bad_kw = {
        "left", "right", "full", "outer", "cross", "inner",
        "natural", "using", ",", "semi", "anti", "lateral",
    }
    if any(t in bad_kw for t in toks):
        return None

    i = 1
    units: list[tuple[str, str | None]] = []  # (table, alias)
    pred_groups: list[list[str]] = []  # raw conjunct token-lists

    def take_unit(i: int) -> tuple[str, str | None, int] | None:
        if i >= len(toks) or not _IDENT_RE.fullmatch(toks[i]) or "." in toks[i]:
            return None
        table, i = toks[i], i + 1
        alias: str | None = None
        if i < len(toks) and toks[i] == "as":
            i += 1
            if i >= len(toks) or not _IDENT_RE.fullmatch(toks[i]):
                return None
            alias, i = toks[i], i + 1
        elif (
            i < len(toks)
            and toks[i] not in ("join", "on")
            and _IDENT_RE.fullmatch(toks[i])
            and "." not in toks[i]
        ):
            alias, i = toks[i], i + 1
        return table, alias, i

    first = take_unit(i)
    if first is None:
        return None
    t0, a0, i = first
    units.append((t0, a0))
    while i < len(toks):
        if toks[i] != "join":
            return None
        unit = take_unit(i + 1)
        if unit is None:
            return None
        t, a, i = unit
        units.append((t, a))
        if i >= len(toks) or toks[i] != "on":
            return None
        i += 1
        cur: list[str] = []
        while i < len(toks) and toks[i] != "join":
            if toks[i] == "and":
                pred_groups.append(cur)
                cur = []
            else:
                cur.append(toks[i])
            i += 1
        pred_groups.append(cur)

    tables = [t for t, _ in units]
    if len(set(tables)) != len(tables):
        return None  # self-join: alias erasure would conflate sides
    aliases = [a for _, a in units if a is not None]
    if len(set(aliases)) != len(aliases):
        return None  # duplicate aliases: ambiguous/illegal SQL must
        # refuse here, not be served a plausible answer from the MV
    alias_map = {a: t for t, a in units if a is not None}
    if set(alias_map) & set(tables) and any(
        alias_map.get(t, t) != t for t in set(alias_map) & set(tables)
    ):
        return None  # an alias shadows a DIFFERENT table's name

    def canon_side(tok: str) -> str | None:
        if _LITERAL_RE.fullmatch(tok):
            return tok
        if not _IDENT_RE.fullmatch(tok):
            return None
        if "." in tok:
            qual, col = tok.split(".", 1)
            return f"{alias_map.get(qual, qual)}.{col}"
        return tok

    preds: list[str] = []
    for g in pred_groups:
        if len(g) != 3 or g[1] != "=":
            return None
        lhs, rhs = canon_side(g[0]), canon_side(g[2])
        if lhs is None or rhs is None:
            return None
        preds.append(" = ".join(sorted((lhs, rhs))))
    return (
        "tables:" + ",".join(sorted(tables))
        + "|on:" + ";".join(sorted(preds))
    )


def _conjuncts(where: str | None) -> list[tuple[str, str]]:
    """Top-level AND conjuncts of a WHERE text as (normalized,
    original) pairs — normalized like the fragment core (tokens
    lowercased except string literals, space-joined) for matching,
    original-case for column-reference checks and filter application.
    A parenthesized conjunct keeps its parens (so ``(a = 1)`` does not
    match ``a = 1`` — the refuse direction). The AND that belongs to a
    preceding depth-0 BETWEEN is part of that conjunct, never a split
    point (``k BETWEEN 10 AND 50`` is ONE conjunct). A depth-0 CASE
    raises ``UnsupportedSQL`` — its WHEN/THEN arms can carry ANDs this
    splitter cannot attribute, so the whole WHERE refuses loudly
    (``rewrite`` catches and returns None)."""
    if where is None:
        return []
    from .sql_frontend import _tokenize

    toks = _tokenize(where)
    groups: list[list[str]] = []
    cur: list[str] = []
    depth = 0
    pending_between = False
    for t in toks:
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        low = t.lower()
        if depth == 0 and low == "case":
            raise UnsupportedSQL(
                "CASE inside a WHERE is not splittable into conjuncts"
            )
        if depth == 0 and low == "and" and not pending_between:
            groups.append(cur)
            cur = []
        else:
            if depth == 0 and low == "between":
                pending_between = True
            elif depth == 0 and low == "and":
                pending_between = False
            cur.append(t)
    groups.append(cur)
    out = []
    for g in groups:
        if not g:
            continue
        norm = " ".join(x if x.startswith("'") else x.lower() for x in g)
        out.append((norm, " ".join(g)))
    return out


class MaterializedView:
    """A stored GROUP BY aggregate — over one table or a join chain,
    optionally FILTERED: parquet rows + the parsed definition used for
    matching. ``build`` executes the definition through Spark SQL and
    writes the store; key columns keep their names, each aggregate
    lands under its ``AS`` alias. A join-backed MV answers queries
    over the SAME join fragment (exact normalized-token match — see
    ``_fragment_parts``); a filtered MV answers candidates whose WHERE
    conjunctively IMPLIES the view's — every view conjunct must appear
    token-identically in the candidate, and the residual conjuncts
    must reference MV keys only (they then filter stored rows
    exactly). Anything weaker refuses — never a wrong rewrite. At
    100 TB this is the difference between re-running a fact scan (or
    a fact-to-fact join) and reading a few thousand stored rows."""

    def __init__(self, name: str, defining_sql: str, path: str):
        self.name = name
        self.path = path
        self.spec = parse_join_agg_sql(defining_sql)
        core, where, tables, canon = _fragment_parts(
            self.spec["fragment_sql"]
        )
        self.view_conjuncts = {n for n, _ in _conjuncts(where)}
        self.canon = canon
        if self.spec["having"]:
            raise UnsupportedSQL("MV definitions cannot carry HAVING")
        for a in self.spec["aggs"]:
            if a["fn"] == "count_distinct":
                raise UnsupportedSQL(
                    "count(DISTINCT) partials are not re-aggregable — "
                    "store the distinct keys as MV grouping keys instead"
                )
        self.core = core
        self.tables = tables
        self.defining_sql = defining_sql

    # -- build ----------------------------------------------------------

    def build(self, spark: SparkSession, sf_dir: str) -> None:
        for t in self.tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        spark.sql(self.defining_sql).write.mode("overwrite").parquet(
            self.path
        )

    # -- matching -------------------------------------------------------

    def _agg_by(self, fn: str, arg: str) -> str | None:
        """Stored column holding the ``fn(arg)`` partial, if any."""
        for a in self.spec["aggs"]:
            if a["fn"] == fn and a["arg"] == arg:
                return a["out"]
        return None

    def rewrite(self, spark: SparkSession, sql: str) -> DataFrame | None:
        """Answer ``sql`` from the stored MV, or ``None`` when the
        statement is not exactly derivable (the caller falls back to
        the base table)."""
        try:
            q = parse_join_agg_sql(sql)
            core, where, _, canon = _fragment_parts(q["fragment_sql"])
            cand = _conjuncts(where)
        except UnsupportedSQL:
            return None
        if core != self.core and not (
            canon is not None and canon == self.canon
        ):
            return None
        if q["having"]:
            return None
        keys = set(self.spec["key_names"])
        # grouping keys: expressions over MV key columns only
        for k in q["keys"]:
            if not _column_refs(k) <= keys:
                return None
        # filter implication: every view conjunct must appear
        # token-identically in the candidate (candidate ⇒ view), and
        # the RESIDUAL conjuncts may reference MV key columns only —
        # they then filter MV rows exactly (each MV row is one
        # base-key group of rows already satisfying the view filter)
        if not self.view_conjuncts <= {n for n, _ in cand}:
            return None
        residual = [
            orig for n, orig in cand if n not in self.view_conjuncts
        ]
        for r in residual:
            if not _column_refs(r) <= keys:
                return None
        where = " AND ".join(f"({r})" for r in residual) or None
        # aggregates: derivable from stored partials
        derived: list[str] = []
        for a in q["aggs"]:
            fn, arg, out = a["fn"], a["arg"], a["out"]
            if fn == "count":
                src = self._agg_by("count", arg)
                if src is None:
                    return None
                derived.append(f"CAST(sum({src}) AS BIGINT) AS {out}")
            elif fn == "sum":
                src = self._agg_by("sum", arg)
                if src is None:
                    return None
                derived.append(f"sum({src}) AS {out}")
            elif fn in ("min", "max"):
                src = self._agg_by(fn, arg)
                if src is None:
                    return None
                derived.append(f"{fn}({src}) AS {out}")
            elif fn == "avg":
                s = self._agg_by("sum", arg)
                c = self._agg_by("count", arg)
                if s is None or c is None:
                    return None
                derived.append(
                    f"CAST(sum({s}) AS DOUBLE) / sum({c}) AS {out}"
                )
            else:  # count_distinct and anything exotic: not derivable
                return None
        # rewrite() must never raise on valid SQL: a residual or key
        # expression Spark cannot parse/resolve against the store is a
        # REFUSAL (fall back to the base table), not an error.
        from pyspark.errors import AnalysisException, ParseException

        try:
            mv = spark.read.parquet(self.path)
            if where is not None:
                mv = mv.where(where)
            key_exprs = [
                f"{k} AS {n}" for k, n in zip(q["keys"], q["key_names"])
            ]
            grouped = mv.selectExpr(
                *key_exprs,
                *[a["out"] for a in self.spec["aggs"]],
            ).groupBy(*q["key_names"])
            from pyspark.sql import functions as F

            return grouped.agg(
                *[
                    F.expr(d.rsplit(" AS ", 1)[0]).alias(
                        d.rsplit(" AS ", 1)[1]
                    )
                    for d in derived
                ]
            )
        except (AnalysisException, ParseException):
            return None
