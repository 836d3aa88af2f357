"""Generic distributed as-of join.

``temporal.q_join_asof`` hand-rolls the union + running-window trick
for one fixed query; this module is the general OPERATOR a reference
user would reach for (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics): for each left row, the single right row with the largest
``right_ts <= left_ts`` (direction='backward'; 'forward' mirrors to
the smallest ``right_ts >= left_ts``) within the same key group,
optionally within a tolerance window, as a left or inner join.

Scale posture — why union + window instead of a join:
- The naive formulation (theta join ``r.ts <= l.ts`` then argmax per
  left row) materializes O(|L| × matches) pairs — quadratic per key
  and a guaranteed skew bomb at 100 TB.
- Here both sides UNION into one relation tagged by side, and ONE
  window pass per key (sorted by ts, right rows before left rows at
  equal ts so ties are inclusive) carries the latest right payload
  forward with ``last(_, ignorenulls=True)``. One shuffle on the
  keys, a linear scan per key, no pair blow-up — the standard
  distributed as-of pattern.
- The right payload rides as ONE struct column, so the window
  carries a single value regardless of how many columns are joined
  in.

Determinism: when several right rows share (key, ts), the window
orders them by the struct itself, so "the" match is the struct-max —
stable across runs and engines. Callers who need a specific
tie-winner should pre-aggregate the right side to one row per
(key, ts), which is also what makes the result order-insensitively
comparable to DuckDB's ASOF JOIN (whose tie pick is unspecified).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    how: str = "left",
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on equal ``keys`` and the
    nearest ``right_ts`` at-or-before (``backward``) / at-or-after
    (``forward``) each ``left_ts``.

    Returns all ``left`` columns plus ``right_cols`` (default: every
    right column except the keys), NULL-filled where no match exists
    (``how='left'``) or with those rows dropped (``how='inner'``).
    ``tolerance`` (a Column interval, e.g. ``F.expr("INTERVAL 1
    HOUR")``) voids matches farther than that from the left timestamp.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward, got {direction!r}"
        )
    for c in keys:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"key {c} must exist on both sides")
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys
        ]
    clash = [c for c in right_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"right columns {clash} collide with left columns — alias "
            f"them on the right side first"
        )

    pay = F.struct(
        F.col(right_ts).alias("__matched_ts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        pay.alias("__rpay"),
    )
    pay_type = r.schema["__rpay"].dataType
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_type).alias("__rpay"),
    )
    # align: right rows carry NULL for non-key left columns
    l_cols = [c for c in left.columns]
    r_aligned = r.select(
        *[
            F.col(c) if c in keys
            else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in l_cols
        ],
        "__ts",
        "__side",
        "__rpay",
    )
    both = l.select(*l_cols, "__ts", "__side", "__rpay").unionByName(
        r_aligned
    )

    asc = direction == "backward"
    order = [
        F.asc("__ts") if asc else F.desc("__ts"),
        # right rows first at equal ts → at-or-before / at-or-after
        # is INCLUSIVE; then the payload struct itself so same-(key,
        # ts) right rows resolve to the struct-max deterministically.
        F.asc("__side"),
        F.asc("__rpay"),
    ]
    win = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        both.withColumn(
            "__m", F.last("__rpay", ignorenulls=True).over(win)
        )
        .where(F.col("__side") == 1)
        .drop("__ts", "__side", "__rpay")
    )
    if tolerance is not None:
        gap_ok = (
            F.col(f"__m.__matched_ts") + tolerance >= F.col(left_ts)
            if asc
            else F.col(f"__m.__matched_ts") - tolerance <= F.col(left_ts)
        )
        matched = matched.withColumn(
            "__m", F.when(gap_ok, F.col("__m"))
        )
    if how == "inner":
        matched = matched.where(F.col("__m").isNotNull())
    out = matched.select(
        *l_cols,
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )
    return out
