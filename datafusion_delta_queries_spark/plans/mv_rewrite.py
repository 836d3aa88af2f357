"""Materialized-view query rewrite — answer a GROUP BY from a stored
aggregate instead of the base table.

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


def _split_fragment(fragment_sql: str) -> tuple[str, str | None]:
    """(table, where_pred) of a parse_join_agg_sql fragment. Raises
    UnsupportedSQL for anything but one bare table."""
    m = re.search(
        r"\bFROM\s+([A-Za-z_][A-Za-z_0-9]*)\s*(?:WHERE\s+(.*))?$",
        fragment_sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise UnsupportedSQL(
            "MV rewrite covers single-table GROUP BY statements; got "
            f"fragment {fragment_sql!r}"
        )
    return m.group(1), (m.group(2).strip() if m.group(2) else None)


class MaterializedView:
    """A stored single-table GROUP BY aggregate: parquet rows + the
    parsed definition used for matching. ``build`` executes the
    definition through Spark SQL and writes the store; key columns
    keep their names, each aggregate lands under its ``AS`` alias."""

    def __init__(self, name: str, defining_sql: str, path: str):
        self.name = name
        self.path = path
        self.spec = parse_join_agg_sql(defining_sql)
        table, where = _split_fragment(self.spec["fragment_sql"])
        if where is not None:
            raise UnsupportedSQL(
                "MV definitions carry no WHERE here — filter at query "
                "time (a filtered MV would additionally need predicate "
                "implication to match)"
            )
        if self.spec["having"]:
            raise UnsupportedSQL("MV definitions cannot carry HAVING")
        for a in self.spec["aggs"]:
            if a["fn"] == "count_distinct":
                raise UnsupportedSQL(
                    "count(DISTINCT) partials are not re-aggregable — "
                    "store the distinct keys as MV grouping keys instead"
                )
        self.table = table
        self.defining_sql = defining_sql

    # -- build ----------------------------------------------------------

    def build(self, spark: SparkSession, sf_dir: str) -> None:
        load_table(spark, sf_dir, self.table).createOrReplaceTempView(
            self.table
        )
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
            table, where = _split_fragment(q["fragment_sql"])
        except UnsupportedSQL:
            return None
        if table != self.table or q["having"]:
            return None
        keys = set(self.spec["key_names"])
        # grouping keys: expressions over MV key columns only
        for k in q["keys"]:
            if not _column_refs(k) <= keys:
                return None
        # filter: references MV key columns only (it then filters MV
        # rows exactly — each MV row is one base-key group)
        if where is not None and not _column_refs(where) <= keys:
            return None
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
            *[F.expr(d.rsplit(" AS ", 1)[0]).alias(d.rsplit(" AS ", 1)[1])
              for d in derived]
        )
