"""Scale patterns as runnable, oracle-checked queries.

These exist to keep the 100 TB idioms (functions/skew.py, bucketed
layout) exercised by the driver's correctness gate, not just unit
tests: the salted aggregation must produce bit-identical results to
the plain GROUP BY it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.skew import salted_agg, salted_join


def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the 3 hot returnflag keys.

    l_quantity is integral-valued, so partial sums recombine exactly
    and the result matches a single-phase GROUP BY bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        key_cols=["l_returnflag"],
        partial_aggs=[
            F.sum("l_quantity").alias("p_qty"),
            F.count("*").alias("p_cnt"),
            F.max("l_extendedprice").alias("p_max"),
        ],
        final_aggs=[
            F.round(F.sum("p_qty"), 2).alias("sum_qty"),
            F.sum("p_cnt").cast("bigint").alias("n_items"),
            F.round(F.max("p_max"), 2).alias("max_price"),
        ],
        salt_from="l_orderkey",
        n_salts=16,
    )


ORACLE_AGG_SALTED = """
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_items,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (16 salts), aggregated per priority.

    The salt splits each hot order key 16 ways; orders replicate 16×.
    The join output is row-identical to the un-salted join, so the
    post-join aggregate matches the plain-SQL oracle exactly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        li.where(F.col("l_shipdate") >= "1997-01-01"),
        orders,
        fact_key="l_orderkey",
        dim_key="o_orderkey",
        salt_from="l_linenumber",
        n_salts=16,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


ORACLE_JOIN_SALTED = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""


def q_join_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-reduction for a join too big to broadcast: the fact
    side is pre-filtered by a broadcast SEMI join on just the
    selective dim's join keys, so the wide shuffle join (pinned to
    sort-merge here — at 100 TB neither side broadcasts) shuffles
    only the ~20% of lineitem that can match, instead of the whole
    fact table. Logically a no-op — the semi join admits exactly the
    rows the wide join would keep — which is what the oracle (the
    plain join) certifies; the plan shape (BroadcastHashJoin LeftSemi
    feeding a SortMergeJoin) is pinned in tests/test_plan_audit.py,
    alongside Spark's own AQE runtime-bloom-filter variant of the
    same idea (might_contain injected into the fact scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = load_table(spark, sf_dir, "orders").where(
        "o_orderpriority = '1-URGENT'"
    )
    keys = sel.select("o_orderkey")
    reduced = li.join(
        F.broadcast(keys), li.l_orderkey == keys.o_orderkey, "left_semi"
    )
    wide = reduced.join(
        sel.hint("merge"), reduced.l_orderkey == sel.o_orderkey
    )
    return wide.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(
            F.expr(
                "CAST(floor(l_extendedprice * (1 - l_discount) * 100"
                " + 0.5) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("revenue_cents"),
    )


ORACLE_JOIN_SEMI_REDUCTION = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
"""


def q_layout_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-order curve math as an oracle row: every lineitem is
    mapped to a 16-bit z-value by interleaving the low 8 bits of
    (l_partkey % 256, l_suppkey % 256) — the identical JVM bit
    expressions ``sources/layout.zorder_write`` clusters files by —
    then profiled per curve segment (z >> 10: 64 buckets of 1,024
    cells). A green row pins the bit-interleave engine-for-engine;
    the PHYSICAL pruning effect of writing files along this curve is
    measured from real parquet footers in tests/test_layout.py
    (a 10% box opens <=50% of row groups; a second-key predicate
    prunes where a single-key sort cannot)."""
    from ..sources.layout import zvalue

    li = load_table(spark, sf_dir, "lineitem")
    z = zvalue([F.col("l_partkey") % 256, F.col("l_suppkey") % 256])
    return (
        li.withColumn("z", z)
        .groupBy(F.shiftright(F.col("z"), 10).alias("zb"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("z").cast("bigint").alias("min_z"),
            F.max("z").cast("bigint").alias("max_z"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
    )


def _zvalue_sql(a_expr: str, b_expr: str, bits: int = 8) -> str:
    """DuckDB rendition of sources/layout.zvalue: bit i of column j
    lands at position i*2 + j."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({b_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


ORACLE_LAYOUT_ZORDER = f"""
WITH zt AS (
  SELECT ({_zvalue_sql('l_partkey % 256', 'l_suppkey % 256')}) AS z,
         l_quantity
  FROM lineitem
)
SELECT CAST(z >> 10 AS BIGINT) AS zb,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(z) AS BIGINT) AS min_z,
       CAST(max(z) AS BIGINT) AS max_z,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
FROM zt GROUP BY 1
"""


def q_zonemap_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full layout + skipping-index lifecycle: lineitem rewritten
    z-ordered on (l_partkey, l_suppkey), a ZoneMapIndex built over the
    files (the per-file min/max a lakehouse log keeps), and a central
    ~10% box read through ``read_pruned`` — the scan opens only the
    overlapping files (sanity-asserted inline; the strict skipping
    bound is measured in tests/test_zonemap.py) with the box
    re-applied as the residual filter. The oracle aggregates the same
    box over the raw table, so a green row certifies that file
    skipping changed nothing. Box bounds use integer arithmetic only
    (span*45//100) so both engines compute identical cuts."""
    import os

    from ..sources.layout import zorder_write
    from ..sources.zonemap import ZoneMapIndex
    from .signed_queries import _cagg_state_dir

    cols = ["l_partkey", "l_suppkey"]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", *cols, "l_quantity"
    )
    root = _cagg_state_dir()
    table = os.path.join(root, "table")
    zorder_write(li, table, cols, n_files=8)
    zm = ZoneMapIndex(spark, os.path.join(root, "zonemap"), table, cols)
    n_files = zm.build()

    st = li.agg(
        F.min(cols[0]), F.max(cols[0]), F.min(cols[1]), F.max(cols[1])
    ).collect()[0]
    box = {}
    for c, (mn, mx) in zip(cols, ((st[0], st[1]), (st[2], st[3]))):
        span = mx - mn
        box[c] = (mn + span * 45 // 100, mn + span * 55 // 100)
    pruned = zm.read_pruned(box)
    assert len(set(pruned.inputFiles())) <= n_files
    return pruned.groupBy((F.col("l_suppkey") % 4).alias("g")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
    )


ORACLE_ZONEMAP_PRUNED = """
WITH s AS (
  SELECT min(l_partkey) AS mn1, max(l_partkey) AS mx1,
         min(l_suppkey) AS mn2, max(l_suppkey) AS mx2
  FROM lineitem
)
SELECT l_suppkey % 4 AS g,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem, s
WHERE l_partkey BETWEEN mn1 + (mx1 - mn1) * 45 // 100
                    AND mn1 + (mx1 - mn1) * 55 // 100
  AND l_suppkey BETWEEN mn2 + (mx2 - mn2) * 45 // 100
                    AND mn2 + (mx2 - mn2) * 55 // 100
GROUP BY 1
"""


def q_bloom_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-lookup file skipping where the zone map is blind: orders
    rewritten clustered by DATE (so every file's orderkey range spans
    nearly the whole domain — min/max pruning can skip nothing), a
    ``BloomFileIndex`` built over ``o_orderkey``, and three
    deterministic unique-key lookups (min key, max key, first key at
    or above the floored mean) read through ``read_pruned`` — each
    opens ~1 of the 8 files (auto-sized filter: ~10 bits per
    row-per-file ≈ 1% fp at k=5; a strict subset is asserted inline,
    the tight ~1-file bound in tests/test_bloom.py), with the
    equality re-applied as the residual filter. The oracle joins the same three
    scalar-subquery keys against the raw table, so a green row
    certifies that Bloom skipping changed nothing. The key probes use
    integer-only arithmetic (floor) so both engines pick identical
    keys. At 100 TB this is the needle-in-a-haystack path: ~1 file
    opened out of ~1M, state ∝ files, maintenance ∝ new files."""
    import os

    from ..sources.bloom import BloomFileIndex
    from .signed_queries import _cagg_state_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    root = _cagg_state_dir()
    table = os.path.join(root, "table")
    (
        orders.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("errorifexists")
        .parquet(table)
    )
    bf = BloomFileIndex(spark, os.path.join(root, "bloom"), table, "o_orderkey")
    n_files = bf.build()

    # Three deterministic probe keys (1-row driver probes — the same
    # documented metadata class as the sinks' touched-partition values).
    lo, hi, mean_floor = orders.agg(
        F.min("o_orderkey"),
        F.max("o_orderkey"),
        F.floor(F.avg("o_orderkey")).cast("bigint"),
    ).collect()[0]
    mid = (
        orders.where(F.col("o_orderkey") >= mean_floor)
        .agg(F.min("o_orderkey"))
        .collect()[0][0]
    )
    frames = []
    for key in (lo, mid, hi):
        pruned = bf.read_pruned(key)
        # strict subset = pruning happened; the TIGHT ~1-file bound is
        # asserted at controlled fill in tests/test_bloom.py (an inline
        # ≤2 held at sf≤0.01 but is probabilistic across SFs)
        assert 1 <= len(set(pruned.inputFiles())) < n_files, "must prune"
        frames.append(pruned)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    assert n_files == 8
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round("o_totalprice", 2).alias("price"),
    )


ORACLE_BLOOM_PRUNED = """
WITH ks AS (
  SELECT min(o_orderkey) AS k FROM orders
  UNION ALL
  SELECT min(o_orderkey) FROM orders
  WHERE o_orderkey >= (SELECT CAST(floor(avg(o_orderkey)) AS BIGINT)
                       FROM orders)
  UNION ALL
  SELECT max(o_orderkey) FROM orders
)
SELECT o_orderkey, o_custkey, o_orderdate,
       round(o_totalprice, 2) AS price
FROM orders JOIN ks ON o_orderkey = k
"""


def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle-free big-big join: orders and lineitem written as
    BUCKETED tables (8 buckets on the join key, sorted within bucket),
    then joined through the catalog — Catalyst sees both sides
    pre-partitioned on the key and plans a sort-merge join with ZERO
    Exchange on either input (asserted inline against the formatted
    physical plan; the broadcast alternative is suppressed with a
    MERGE hint so the audit pins the co-located path, not a
    small-table shortcut).

    This is the 100 TB pattern the one-shot ``broadcast()`` cannot
    reach: when BOTH sides are fact-sized, the only way to avoid
    re-shuffling petabytes on every join is to pay the partitioning
    once at write time and reuse it forever. Bucket count is a
    one-time layout decision (here 8 to match the fixture; 4096+ on a
    real cluster) — every subsequent join/groupBy on the key rides the
    stored distribution. The aggregation after the join still shuffles
    on its own (tiny) grouping key; only the join-side shuffle — the
    one proportional to table size — is eliminated.
    """
    import os

    from .signed_queries import _cagg_state_dir

    root = _cagg_state_dir()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    for name, df, key in (
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", li, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(root, name))
            .saveAsTable(name)
        )
    j = (
        spark.table("b_lineitem")
        .hint("merge")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
    assert "SortMergeJoin" in plan
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
        F.sum("l_quantity").cast("bigint").alias("qty"),
    )


ORACLE_JOIN_BUCKETED = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(sum(l.l_quantity) AS BIGINT) AS qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def q_join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-BIG interval-overlap join via BUCKET EXPANSION — the range
    join neither a broadcast (both sides corpus-scaled) nor a plain
    sort-merge (no equi key) can run at 100 TB; a naive theta join is
    a cartesian. The standard trick: with bucket width W = the MAX
    interval length, every interval registers in the ≤2 fixed-width
    time buckets it touches, the join runs as an EQUI join on the
    bucket id with the exact overlap predicate riding along, and the
    de-dup needs NO distinct — each overlapping pair is kept only in
    the one bucket containing max(start_a, start_b) (both intervals
    provably register there, and only one bucket holds that instant).

    Sides: incident windows (error events with value > 190, 120 s) ×
    purchase windows (120 s), all users — deliberately NO user equi
    key, so the bucket IS the only equi key. Timestamps become
    integer MICROSECONDS SINCE 2024-01-01 via timestampdiff — the
    NTZ-safe engine-portable epoch. Pair volume is inherently
    quadratic in temporal density (SCALE.md Known costs); the plan
    shape — hash join on bucket, zero cartesian — is pinned in
    tests/test_plan_audit.py."""
    _W_US = 120 * 1_000_000  # bucket width == interval length
    _EPOCH = "timestamp'2024-01-01 00:00:00'"

    ev = load_table(spark, sf_dir, "events")

    def windows(df: DataFrame, pfx: str) -> DataFrame:
        base = df.selectExpr(
            f"event_id AS {pfx}_id",
            f"timestampdiff(MICROSECOND, {_EPOCH}, ts) AS {pfx}_s",
        ).selectExpr(
            f"{pfx}_id", f"{pfx}_s", f"{pfx}_s + {_W_US} AS {pfx}_e"
        )
        # each interval touches exactly the buckets of [s, e): with
        # W == length that is floor(s/W) and (possibly) floor(s/W)+1
        return base.selectExpr(
            f"{pfx}_id",
            f"{pfx}_s",
            f"{pfx}_e",
            f"explode(sequence({pfx}_s DIV {_W_US}, "
            f"({pfx}_e - 1) DIV {_W_US})) AS bucket",
        )

    a = windows(
        ev.where("event_type = 'error' AND value > 190"), "a"
    )
    b = windows(ev.where("event_type = 'purchase'"), "b")
    pairs = a.join(b, "bucket").where(
        # strict overlap of half-open windows, counted ONCE: only in
        # the bucket that contains the overlap's start instant
        f"a_s < b_e AND b_s < a_e "
        f"AND bucket = greatest(a_s, b_s) DIV {_W_US}"
    )
    return pairs.groupBy(
        F.expr(
            "date_format(date_add(date'2024-01-01', "
            "CAST(a_s DIV 86400000000 AS INT)), 'yyyy-MM-dd')"
        ).alias("day")
    ).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("a_id").cast("bigint").alias("a_checksum"),
        F.sum("b_id").cast("bigint").alias("b_checksum"),
    )


ORACLE_JOIN_INTERVAL_BUCKETED = """
WITH a AS (
  SELECT event_id AS a_id,
         date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)
           AS a_s
  FROM events WHERE event_type = 'error' AND value > 190
), b AS (
  SELECT event_id AS b_id,
         date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)
           AS b_s
  FROM events WHERE event_type = 'purchase'
), pairs AS (
  SELECT a_id, b_id, a_s
  FROM a JOIN b
    ON a.a_s < b.b_s + 120000000 AND b.b_s < a.a_s + 120000000
)
SELECT strftime(DATE '2024-01-01'
                + (a_s // 86400000000) * INTERVAL 1 DAY, '%Y-%m-%d')
         AS day,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(a_id) AS BIGINT) AS a_checksum,
       CAST(sum(b_id) AS BIGINT) AS b_checksum
FROM pairs GROUP BY day
"""


def q_generated_column_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta's GENERATED-column partition pruning: the table is
    partitioned by ``p_month`` GENERATED from ``o_orderdate``
    (``sources/generated.py`` records the generation expression in a
    manifest), and a query filtering ONLY on the raw date still reads
    just the overlapping month directories — the reader derives the
    partition predicate from the generation expression, exactly as
    Delta does for date_format generations. Inline audit: the scan's
    ``inputFiles`` stay within the three derived months. At 100 TB
    this turns every raw-timestamp range filter into an O(months)
    directory read with zero user awareness of the partition key."""
    from datetime import date

    from ..catalog import load_table
    from ..sources.generated import (
        read_pruned_by_range,
        write_month_partitioned,
    )
    from .signed_queries import _cagg_state_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    path = f"{_cagg_state_dir()}/orders_gen"
    write_month_partitioned(orders, path, "o_orderdate")
    lo, hi = date(1995, 3, 1), date(1995, 5, 31)
    pruned = read_pruned_by_range(spark, path, "o_orderdate", lo, hi)
    opened = {
        f.rsplit("/p_month=", 1)[1].split("/")[0]
        for f in pruned.inputFiles()
    }
    assert opened <= {"1995-03", "1995-04", "1995-05"}, opened
    return pruned.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).cast("bigint").alias("cents"),
    )


ORACLE_GENERATED_PRUNING = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-03-01 00:00:00'
  AND o_orderdate <= TIMESTAMP '1995-05-31 00:00:00'
GROUP BY month
"""


def q_join_dynamic_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic Partition Pruning: the events fact is written
    directory-partitioned by day; a small filtered dimension of
    selected days joins it on the partition column, and Catalyst
    injects a ``dynamicpruningexpression`` into the fact scan — at
    runtime the broadcast result of the dim side becomes the
    partition filter, so only the selected days' directories are ever
    opened (asserted inline against the formatted plan).

    This is the third leg of the pruning stool next to static
    partition pruning (``generated_column_pruning``) and skipping
    indexes (zonemap/bloom): the selective predicate lives on the
    DIMENSION, so no static filter on the fact exists at plan time —
    at 100 TB this is a star-schema query reading 4 of 10,000 day
    directories instead of all of them, with zero scan-side predicate
    written by the user. DPP reuses the join's own broadcast
    (``reuseBroadcastOnly``), so the pruning costs nothing extra."""
    import os

    from .signed_queries import _cagg_state_dir

    path = os.path.join(_cagg_state_dir(), "events_by_day")
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn(
        "day", F.expr("date_format(ts, 'yyyy-MM-dd')")
    ).write.partitionBy("day").parquet(path)
    fact = spark.read.parquet(path)
    day_t = dict(fact.dtypes)["day"]
    dim = (
        ev.selectExpr("date(ts) AS d")
        .distinct()
        .where("dayofmonth(d) % 7 = 3")
        .selectExpr(f"CAST(d AS {day_t}) AS day")
    )
    out = (
        fact.join(F.broadcast(dim), "day")
        .groupBy(
            F.expr("date_format(day, 'yyyy-MM-dd')").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
            ).cast("bigint").alias("value_cents"),
        )
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), (
        "DPP missing from the fact scan:\n" + plan[:2000]
    )
    return out


ORACLE_JOIN_DPP = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
WHERE day(CAST(ts AS DATE)) % 7 = 3
GROUP BY 1, 2
"""


def queries_and_oracles():
    return (
        {
            "agg_salted_skew": q_agg_salted_skew,
            "join_salted_skew": q_join_salted_skew,
            "layout_zorder_locality": q_layout_zorder_locality,
            "join_semi_reduction": q_join_semi_reduction,
            "zonemap_pruned_scan": q_zonemap_pruned_scan,
            "bloom_pruned_lookup": q_bloom_pruned_lookup,
            "join_bucketed_colocated": q_join_bucketed_colocated,
            "join_interval_bucketed": q_join_interval_bucketed,
            "generated_column_pruning": q_generated_column_pruning,
            "join_dynamic_partition_pruning": q_join_dynamic_partition_pruning,
        },
        {
            "agg_salted_skew": ORACLE_AGG_SALTED,
            "join_salted_skew": ORACLE_JOIN_SALTED,
            "layout_zorder_locality": ORACLE_LAYOUT_ZORDER,
            "join_semi_reduction": ORACLE_JOIN_SEMI_REDUCTION,
            "zonemap_pruned_scan": ORACLE_ZONEMAP_PRUNED,
            "bloom_pruned_lookup": ORACLE_BLOOM_PRUNED,
            "join_bucketed_colocated": ORACLE_JOIN_BUCKETED,
            "join_interval_bucketed": ORACLE_JOIN_INTERVAL_BUCKETED,
            "generated_column_pruning": ORACLE_GENERATED_PRUNING,
            "join_dynamic_partition_pruning": ORACLE_JOIN_DPP,
        },
    )
