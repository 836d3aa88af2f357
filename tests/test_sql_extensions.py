"""QUALIFY and WITH RECURSIVE (seminaive UNION-distinct) extension
surface: rewrite correctness vs hand-written equivalents, cycle
termination, runaway-recursion errors, and parse rejections."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.plans.sql_extensions import (
    run_qualify_sql,
    run_recursive_sql,
)
from datafusion_delta_queries_spark.plans.sql_frontend import UnsupportedSQL


@pytest.fixture(scope="module")
def graph(spark):
    # 0→1→2→0 cycle plus a 2→3 spur and a disconnected 7→8
    spark.sql(
        "SELECT * FROM VALUES (0,1),(1,2),(2,0),(2,3),(7,8) "
        "AS e(src,dst)"
    ).createOrReplaceTempView("g_edges")
    return "g_edges"


def test_qualify_matches_subquery(spark, graph):
    got = run_qualify_sql(
        spark,
        "SELECT src, dst FROM g_edges "
        "QUALIFY row_number() OVER (PARTITION BY src ORDER BY dst DESC)"
        " = 1 ORDER BY src",
    ).collect()
    want = spark.sql(
        "SELECT src, dst FROM (SELECT src, dst, row_number() OVER "
        "(PARTITION BY src ORDER BY dst DESC) AS rn FROM g_edges) "
        "WHERE rn = 1 ORDER BY src"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_qualify_with_limit(spark, graph):
    got = run_qualify_sql(
        spark,
        "SELECT src, dst FROM g_edges QUALIFY "
        "rank() OVER (ORDER BY src, dst) <= 10 "
        "ORDER BY src DESC, dst DESC LIMIT 2",
    ).collect()
    assert [tuple(r) for r in got] == [(7, 8), (2, 3)]


def test_qualify_rejections(spark, graph):
    with pytest.raises(UnsupportedSQL):
        run_qualify_sql(spark, "SELECT src FROM g_edges")
    with pytest.raises(UnsupportedSQL):
        run_qualify_sql(
            spark,
            "SELECT DISTINCT src FROM g_edges QUALIFY "
            "row_number() OVER (ORDER BY src) = 1",
        )


def test_recursive_closure_terminates_on_cycle(spark, graph):
    out = run_recursive_sql(
        spark,
        """
        WITH RECURSIVE reach (n) AS (
          SELECT 0 AS n
          UNION
          SELECT e.dst AS n FROM reach r JOIN g_edges e ON e.src = r.n
        )
        SELECT n FROM reach ORDER BY n
        """,
    )
    # cycle 0→1→2→0 closes without a depth bound; 7/8 unreachable
    assert [r["n"] for r in out.collect()] == [0, 1, 2, 3]


def test_recursive_min_hops(spark, graph):
    out = run_recursive_sql(
        spark,
        """
        WITH RECURSIVE reach (n, hops) AS (
          SELECT 0 AS n, 0 AS hops
          UNION
          SELECT e.dst AS n, r.hops + 1 AS hops
          FROM reach r JOIN g_edges e ON e.src = r.n
          WHERE r.hops < 10
        )
        SELECT n, min(hops) AS hops FROM reach GROUP BY n ORDER BY n
        """,
    )
    assert [tuple(r) for r in out.collect()] == [
        (0, 0), (1, 1), (2, 2), (3, 3),
    ]


def test_recursive_union_all_linear(spark, graph):
    out = run_recursive_sql(
        spark,
        """
        WITH RECURSIVE seq (i) AS (
          SELECT 1 AS i
          UNION ALL
          SELECT i + 1 AS i FROM seq WHERE i < 5
        )
        SELECT sum(i) AS s FROM seq
        """,
    )
    assert out.collect()[0]["s"] == 15


def test_recursive_plain_cte_in_list(spark, graph):
    out = run_recursive_sql(
        spark,
        """
        WITH RECURSIVE doubled AS (
          SELECT src, dst FROM g_edges WHERE src < 5
        ), reach (n) AS (
          SELECT 0 AS n
          UNION
          SELECT e.dst AS n FROM reach r JOIN doubled e ON e.src = r.n
        )
        SELECT count(*) AS c FROM reach
        """,
    )
    assert out.collect()[0]["c"] == 4


def test_recursive_runaway_raises(spark, graph):
    with pytest.raises(UnsupportedSQL, match="terminate"):
        run_recursive_sql(
            spark,
            """
            WITH RECURSIVE seq (i) AS (
              SELECT 1 AS i UNION ALL SELECT i + 1 AS i FROM seq
            )
            SELECT count(*) AS c FROM seq
            """,
            max_iters=10,
        )


def test_recursive_rejections(spark, graph):
    with pytest.raises(UnsupportedSQL, match="self-referencing"):
        run_recursive_sql(
            spark,
            "WITH RECURSIVE a AS (SELECT 1 AS x) SELECT * FROM a",
        )
    with pytest.raises(UnsupportedSQL):
        run_recursive_sql(
            spark,
            "WITH RECURSIVE a (x) AS (SELECT 1 AS x) SELECT a.x FROM a",
        )


def test_recursive_null_rows_terminate(spark):
    # A NULL-keyed edge must not defeat the seen-check (null-safe anti
    # join) — plain anti join would re-add the NULL row forever.
    spark.sql(
        "SELECT * FROM VALUES (0, NULL), (CAST(NULL AS INT), 3) "
        "AS e(src, dst)"
    ).createOrReplaceTempView("g_null_edges")
    out = run_recursive_sql(
        spark,
        """
        WITH RECURSIVE reach (n) AS (
          SELECT 0 AS n
          UNION
          SELECT e.dst AS n
          FROM reach r JOIN g_null_edges e ON e.src <=> r.n
        )
        SELECT count(*) AS c FROM reach
        """,
    )
    # 0 → NULL → 3: all three reached exactly once
    assert out.collect()[0]["c"] == 3


# -- run_extended_sql dispatcher ---------------------------------------


def test_dispatcher_routes_each_shape(spark, graph, tmp_path):
    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_extended_sql,
    )

    # plain SQL falls through to spark.sql
    assert run_extended_sql(
        spark, "SELECT count(*) AS c FROM g_edges"
    ).collect()[0]["c"] == 5
    # QUALIFY routes
    q = run_extended_sql(
        spark,
        "SELECT src, dst FROM g_edges QUALIFY "
        "row_number() OVER (PARTITION BY src ORDER BY dst) = 1",
    )
    assert q.count() == 4  # distinct srcs: 0, 1, 2, 7
    # UNION-distinct recursion routes to the seminaive executor
    r = run_extended_sql(
        spark,
        "WITH RECURSIVE reach (n) AS (SELECT 0 AS n UNION "
        "SELECT e.dst AS n FROM reach r JOIN g_edges e ON e.src = r.n) "
        "SELECT count(*) AS c FROM reach",
    )
    assert r.collect()[0]["c"] == 4
    # ASOF routes
    spark.sql(
        "SELECT * FROM VALUES (0, 10, 1.0), (0, 20, 2.0) AS q(k, qts, bid)"
    ).createOrReplaceTempView("disp_quotes")
    spark.sql(
        "SELECT * FROM VALUES (0, 15) AS t(k, ts)"
    ).createOrReplaceTempView("disp_trades")
    a = run_extended_sql(
        spark,
        "SELECT t.k, t.bid FROM disp_trades t ASOF JOIN disp_quotes q "
        "ON t.k = q.k AND t.ts >= q.qts",
    )
    assert [tuple(r) for r in a.collect()] == [(0, 1.0)]


def test_dispatcher_ctas_materializes(spark, graph, tmp_path):
    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_extended_sql,
    )
    from datafusion_delta_queries_spark.plans.sql_frontend import (
        UnsupportedSQL,
    )

    ws = str(tmp_path / "ws")
    out = run_extended_sql(
        spark,
        "CREATE TABLE big_edges AS SELECT src, dst FROM g_edges "
        "WHERE src < 5",
        workspace=ws,
    )
    assert out.count() == 4
    # the view reads MATERIALIZED files, not a live recompute
    import os

    assert any(
        n.endswith(".parquet") for n in os.listdir(os.path.join(ws, "big_edges"))
    )
    assert spark.sql("SELECT count(*) AS c FROM big_edges").collect()[0][
        "c"
    ] == 4
    with pytest.raises(UnsupportedSQL, match="already exists"):
        run_extended_sql(
            spark,
            "CREATE TABLE big_edges AS SELECT 1 AS x",
            workspace=ws,
        )
    with pytest.raises(UnsupportedSQL, match="workspace"):
        run_extended_sql(spark, "CREATE TABLE t2 AS SELECT 1 AS x")


def test_dispatcher_copy_to(spark, graph, tmp_path):
    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_extended_sql,
    )
    from datafusion_delta_queries_spark.plans.sql_frontend import (
        UnsupportedSQL,
    )

    dest = str(tmp_path / "export_csv")
    out = run_extended_sql(
        spark,
        f"COPY ( SELECT src, dst FROM g_edges ) TO '{dest}' (FORMAT csv)",
    ).collect()[0]
    assert out["n_rows"] == 5 and out["format"] == "csv"
    back = (
        spark.read.option("header", True).option("inferSchema", True)
        .csv(dest)
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, spark.table("g_edges").collect())
    )
    with pytest.raises(UnsupportedSQL, match="format"):
        run_extended_sql(
            spark,
            f"COPY ( SELECT 1 ) TO '{tmp_path}/x' (FORMAT xml)",
        )


def test_pivot_statement_defaults_and_errors(spark):
    """PIVOT without GROUP BY groups by every unconsumed column
    (DuckDB's default); bad shapes raise loudly."""
    import pytest

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_extended_sql,
        run_pivot_sql,
    )
    from datafusion_delta_queries_spark.plans.sql_frontend import (
        UnsupportedSQL,
    )

    spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)],
        "g string, k string, v int",
    ).createOrReplaceTempView("pv_t")
    out = run_extended_sql(spark, "PIVOT pv_t ON k USING sum(v)")
    # v consumed by the agg, k by ON → implicit group = [g]
    assert sorted(out.columns) == ["g", "x", "y"]
    rows = {r["g"]: (r["x"], r["y"]) for r in out.collect()}
    assert rows == {"a": (1, 2), "b": (3, None)}
    with pytest.raises(UnsupportedSQL, match="ON column"):
        run_pivot_sql(spark, "PIVOT pv_t ON nope USING sum(v)")
    with pytest.raises(UnsupportedSQL, match="USING"):
        run_pivot_sql(spark, "PIVOT pv_t ON k")


def test_unpivot_statement_quoted_idents_and_errors(spark):
    import pytest

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_unpivot_sql,
    )
    from datafusion_delta_queries_spark.plans.sql_frontend import (
        UnsupportedSQL,
    )

    spark.createDataFrame(
        [("r1", 1, 2)], 'id string, `a b` int, c int'
    ).createOrReplaceTempView("up_t")
    out = run_unpivot_sql(
        spark, 'UNPIVOT up_t ON "a b", c INTO NAME k VALUE v'
    )
    assert out.columns == ["id", "k", "v"]
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [
        ("a b", 1),
        ("c", 2),
    ]
    with pytest.raises(UnsupportedSQL, match="not in dataset"):
        run_unpivot_sql(spark, "UNPIVOT up_t ON zz INTO NAME k VALUE v")
    with pytest.raises(UnsupportedSQL, match="INTO NAME"):
        run_unpivot_sql(spark, "UNPIVOT up_t ON c")


def test_star_modifiers_rewrite_and_errors(spark):
    import pytest

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_extended_sql,
        run_star_modifiers_sql,
    )
    from datafusion_delta_queries_spark.plans.sql_frontend import (
        UnsupportedSQL,
    )

    spark.createDataFrame(
        [(1, "x", 2.0)], "a int, b string, c double"
    ).createOrReplaceTempView("sm_t")
    out = run_extended_sql(
        spark, "SELECT * EXCLUDE (b) REPLACE (c * 10 AS c) FROM sm_t"
    )
    assert out.columns == ["a", "c"]
    assert out.collect()[0]["c"] == 20.0
    with pytest.raises(UnsupportedSQL, match="not in"):
        run_star_modifiers_sql(spark, "SELECT * EXCLUDE (zz) FROM sm_t")
    with pytest.raises(UnsupportedSQL, match="excluded"):
        run_star_modifiers_sql(
            spark, "SELECT * EXCLUDE (a) REPLACE (a + 1 AS a) FROM sm_t"
        )


def test_recursive_cte_refuses_view_shadowing(spark):
    import pytest

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_recursive_sql,
    )
    from datafusion_delta_queries_spark.plans.sql_frontend import (
        UnsupportedSQL,
    )

    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView(
        "shadow_me"
    )
    with pytest.raises(UnsupportedSQL, match="shadows"):
        run_recursive_sql(
            spark,
            """WITH RECURSIVE shadow_me (n) AS (
                 SELECT 1 UNION SELECT n + 1 FROM shadow_me WHERE n < 3
               ) SELECT * FROM shadow_me""",
        )
    # the pre-existing view is untouched
    assert spark.table("shadow_me").columns == ["x"]


def test_truncated_statements_raise_unsupported(spark):
    import pytest

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_asof_sql,
    )
    from datafusion_delta_queries_spark.plans.merge_sql import (
        execute_insert_overwrite,
    )
    from datafusion_delta_queries_spark.plans.sql_frontend import (
        UnsupportedSQL,
    )

    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("tt")
    for bad in (
        "SELECT x FROM tt a ASOF",
        "SELECT x FROM tt a ASOF JOIN tt b",
    ):
        with pytest.raises(UnsupportedSQL):
            run_asof_sql(spark, bad)
    for bad in (
        "INSERT OVERWRITE t PARTITION",
        "INSERT OVERWRITE t PARTITION ( c",
    ):
        with pytest.raises(UnsupportedSQL):
            execute_insert_overwrite(spark, bad, "/nonexistent", None)


def test_ctas_forwards_workspace_to_body(spark, tmp_path):
    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_extended_sql,
    )

    spark.createDataFrame([(1, "x")], "k int, v string").createOrReplaceTempView(
        "ctas_src"
    )
    ws = str(tmp_path / "ws")
    import os

    os.makedirs(ws)
    run_extended_sql(
        spark,
        "CREATE TABLE ctas_outer AS CREATE TABLE ctas_inner AS "
        "SELECT k, v FROM ctas_src",
        workspace=ws,
    )
    assert spark.table("ctas_inner").count() == 1
    assert spark.table("ctas_outer").count() == 1


def test_recursive_validation_failure_leaves_session_clean(spark):
    """A statement that fails shape validation (body not
    <base> UNION <step>) or Spark-side analysis must leave NO trace:
    no leaked _CTE_VIEW_NAMES entries (which would permanently disable
    the shadow guard) and no leaked temp views (which would shadow
    catalog tables for the rest of the session)."""
    from datafusion_delta_queries_spark.plans import sql_extensions as se

    before_names = set(se._CTE_VIEW_NAMES)

    # shape failure: recursive body has no UNION
    with pytest.raises(UnsupportedSQL, match="UNION"):
        run_recursive_sql(
            spark,
            """WITH RECURSIVE helper_a AS (SELECT 1 AS n),
               bad_rec (n) AS (SELECT n + 1 FROM bad_rec WHERE n < 3)
               SELECT * FROM bad_rec""",
        )
    assert set(se._CTE_VIEW_NAMES) == before_names
    assert not spark.catalog.tableExists("helper_a")
    assert not spark.catalog.tableExists("bad_rec")

    # Spark-side analysis failure in a non-recursive CTE body
    with pytest.raises(Exception):
        run_recursive_sql(
            spark,
            """WITH RECURSIVE helper_b AS (SELECT no_such_col FROM
               VALUES (1) AS t(x)),
               rec_b (n) AS (SELECT 1 UNION SELECT n + 1 FROM rec_b
               WHERE n < 2)
               SELECT * FROM rec_b""",
        )
    assert set(se._CTE_VIEW_NAMES) == before_names
    assert not spark.catalog.tableExists("helper_b")
    assert not spark.catalog.tableExists("rec_b")

    # ...and a subsequent WITH RECURSIVE against a NOW-shadowing name
    # still refuses (the guard survived the failed statements)
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView(
        "helper_a"
    )
    with pytest.raises(UnsupportedSQL, match="shadows"):
        run_recursive_sql(
            spark,
            """WITH RECURSIVE helper_a (n) AS (
                 SELECT 1 UNION SELECT n + 1 FROM helper_a WHERE n < 2
               ) SELECT * FROM helper_a""",
        )
    assert spark.table("helper_a").columns == ["x"]
    spark.catalog.dropTempView("helper_a")


def test_asof_right_key_rename_collision_raises(spark):
    """Renaming the right equi key onto the left name must refuse when
    the right side already carries a DISTINCT column of that name —
    otherwise Spark silently duplicates the column and the join fails
    with an opaque ambiguity (or binds the wrong column)."""
    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_asof_sql,
    )

    spark.sql(
        "SELECT * FROM VALUES (1, 10) AS t(k, ts)"
    ).createOrReplaceTempView("asof_l")
    # right side has BOTH kk (the join key) and k (a distinct column)
    spark.sql(
        "SELECT * FROM VALUES (1, 5, 99, 7) AS t(kk, ts2, k, val)"
    ).createOrReplaceTempView("asof_r")
    with pytest.raises(UnsupportedSQL, match="collides"):
        run_asof_sql(
            spark,
            "SELECT a.k, b.val FROM asof_l a ASOF JOIN asof_r b "
            "ON a.k = b.kk AND a.ts >= b.ts2",
        )


def test_pivot_cardinality_guard(spark):
    """Dynamic PIVOT collects the distinct ON values (they become
    output COLUMNS) — the guard refuses loudly past 10k distinct
    instead of building a million-column frame on the driver."""
    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_pivot_sql,
    )

    spark.range(0, 10_001).selectExpr(
        "CAST(id AS STRING) AS k", "id % 3 AS g", "id AS v"
    ).createOrReplaceTempView("pivot_wide_t")
    with pytest.raises(UnsupportedSQL, match="distinct"):
        run_pivot_sql(
            spark,
            "PIVOT pivot_wide_t ON k USING max(v) GROUP BY g",
        )


def test_shallow_clone_sql_statement(spark, tmp_path):
    """CREATE TABLE ... SHALLOW CLONE ... parses, registers the clone
    handle, reports zero copied files, and rejects malformed or
    conflicting statements loudly."""
    from pyspark.sql import functions as F

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        run_shallow_clone_sql,
    )
    from datafusion_delta_queries_spark.sources.versioned import (
        CdfVersionedTable,
    )

    src = CdfVersionedTable(str(tmp_path / "src"))
    src.write_version(
        spark.createDataFrame([(1, 1)], "k int, v int").withColumn(
            "_change_type", F.lit("insert")
        )
    )
    tables = {"src_t": src}
    row = run_shallow_clone_sql(
        spark, "CREATE TABLE c1 SHALLOW CLONE src_t", tables, str(tmp_path)
    ).collect()[0]
    assert row["copied_files_count"] == 0
    assert row["source_version"] == 0
    assert "c1" in tables and tables["c1"].snapshot(spark).count() == 1

    with pytest.raises(UnsupportedSQL, match="unknown versioned"):
        run_shallow_clone_sql(
            spark, "CREATE TABLE c2 SHALLOW CLONE nope", tables,
            str(tmp_path),
        )
    with pytest.raises(UnsupportedSQL, match="already bound"):
        run_shallow_clone_sql(
            spark, "CREATE TABLE c1 SHALLOW CLONE src_t", tables,
            str(tmp_path),
        )
    with pytest.raises(UnsupportedSQL, match="trailing"):
        run_shallow_clone_sql(
            spark, "CREATE TABLE c3 SHALLOW CLONE src_t AS OF 1",
            tables, str(tmp_path),
        )
    with pytest.raises(UnsupportedSQL, match="expected CREATE TABLE"):
        run_shallow_clone_sql(
            spark, "CREATE TABLE c4 DEEP CLONE src_t", tables,
            str(tmp_path),
        )


def _stage_copy_fixture(spark, tmp_path, n_files=3):
    import os

    from datafusion_delta_queries_spark.sources.versioned import (
        CdfVersionedTable,
    )

    stage = str(tmp_path / "landing")
    spark.range(30).selectExpr(
        "id AS k", "id * 7 AS v"
    ).repartition(n_files).write.parquet(stage)
    vt = CdfVersionedTable(str(tmp_path / "copy_target"))
    files = sorted(
        f for f in os.listdir(stage) if f.endswith(".parquet")
    )
    assert len(files) == n_files
    return stage, vt, files


def test_copy_into_crash_after_commit_never_double_loads(
    spark, tmp_path
):
    """The ADVICE medium: a crash AFTER the commit but BEFORE the
    ledger promotion must not reload the committed files. Simulated
    by hand-running the write-ahead protocol up to the commit and
    stopping — exactly the torn state the old commit-then-record
    ordering left behind."""
    from pyspark.sql import functions as F

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        _read_copy_ledger,
        _write_copy_ledger,
        run_copy_into_sql,
    )

    stage, vt, files = _stage_copy_fixture(spark, tmp_path)
    ledger = vt.root.rstrip("/") + ".copy_ledger"

    # crashed run: intent recorded, commit durable, promotion never ran
    v = vt.next_version()
    _write_copy_ledger(ledger, set(), {"files": files, "version": v})
    vt.write_version(
        spark.read.parquet(
            *[f"{stage}/{f}" for f in files]
        ).withColumn("_change_type", F.lit("insert")),
        version=v,
    )

    # rerun reconciles: promotes WITHOUT re-reading → 0 files loaded,
    # no second commit, table state not doubled
    m = run_copy_into_sql(
        spark, f"COPY INTO t FROM '{stage}'", {"t": vt}
    ).collect()[0]
    assert m["files_loaded"] == 0 and m["commit_version"] is None, m
    assert vt.versions() == [v]
    assert vt.snapshot(spark).count() == 30  # not 60
    loaded, pending = _read_copy_ledger(ledger)
    assert loaded == set(files) and pending is None


def test_copy_into_crash_before_commit_retries_cleanly(spark, tmp_path):
    """Intent recorded but the commit never landed (or landed torn,
    no _SUCCESS): the rerun rolls back and loads the files exactly
    once."""
    import os

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        _write_copy_ledger,
        run_copy_into_sql,
    )

    stage, vt, files = _stage_copy_fixture(spark, tmp_path)
    ledger = vt.root.rstrip("/") + ".copy_ledger"

    # crash flavor 1: intent only, no commit dir at all
    _write_copy_ledger(ledger, set(), {"files": files, "version": 0})
    m = run_copy_into_sql(
        spark, f"COPY INTO t FROM '{stage}'", {"t": vt}
    ).collect()[0]
    assert m["files_loaded"] == len(files) and m["commit_version"] == 0
    assert vt.snapshot(spark).count() == 30

    # crash flavor 2: torn commit dir (parquet fragment, no _SUCCESS)
    stage2 = str(tmp_path / "landing2")
    spark.range(30, 40).selectExpr("id AS k", "id * 7 AS v").coalesce(
        1
    ).write.parquet(stage2)
    new_files = sorted(
        f for f in os.listdir(stage2) if f.endswith(".parquet")
    )
    v = vt.next_version()
    torn = vt._version_dir(v)
    os.makedirs(torn)
    with open(os.path.join(torn, "part-garbage.parquet"), "wb") as fh:
        fh.write(b"\x00not parquet")
    _write_copy_ledger(
        ledger, set(files), {"files": new_files, "version": v}
    )
    m = run_copy_into_sql(
        spark, f"COPY INTO t FROM '{stage2}'", {"t": vt}
    ).collect()[0]
    assert m["files_loaded"] == 1 and m["commit_version"] == v
    assert vt.snapshot(spark).count() == 40
    # idempotent afterwards
    m = run_copy_into_sql(
        spark, f"COPY INTO t FROM '{stage2}'", {"t": vt}
    ).collect()[0]
    assert m["files_loaded"] == 0


def test_copy_into_legacy_list_ledger_migrates(spark, tmp_path):
    """Pre-intent ledgers (bare JSON list) keep working: their names
    count as loaded and the file upgrades to the new format on the
    next run."""
    import json

    from datafusion_delta_queries_spark.plans.sql_extensions import (
        _read_copy_ledger,
        run_copy_into_sql,
    )

    stage, vt, files = _stage_copy_fixture(spark, tmp_path)
    ledger = vt.root.rstrip("/") + ".copy_ledger"
    with open(ledger, "w", encoding="ascii") as fh:
        json.dump(files[:1], fh)  # legacy format, first file loaded

    m = run_copy_into_sql(
        spark, f"COPY INTO t FROM '{stage}'", {"t": vt}
    ).collect()[0]
    assert m["files_loaded"] == len(files) - 1
    loaded, pending = _read_copy_ledger(ledger)
    assert loaded == set(files) and pending is None


def test_recursive_failure_restores_replaced_executor_view(spark):
    """A CTE reusing a name THIS executor registered in an earlier
    statement is createOrReplaceTempView'd; if the statement later
    fails, the earlier view's body must be RESTORED, not just left
    clobbered (ADVICE r11)."""
    from datafusion_delta_queries_spark.plans import sql_extensions as se

    # statement 1: executor registers shared_h = (10)
    got = run_recursive_sql(
        spark,
        """WITH RECURSIVE shared_h AS (SELECT 10 AS n),
           rec_s (n) AS (SELECT n FROM shared_h
                         UNION SELECT n + 1 FROM rec_s WHERE n < 11)
           SELECT * FROM rec_s""",
    )
    assert {r["n"] for r in got.collect()} == {10, 11}
    assert spark.table("shared_h").collect()[0]["n"] == 10
    assert "shared_h" in se._CTE_VIEW_NAMES

    # statement 2: reuses shared_h with a DIFFERENT body (20), then
    # fails Spark-side in a LATER CTE — shared_h must roll back to 10
    with pytest.raises(Exception):
        run_recursive_sql(
            spark,
            """WITH RECURSIVE shared_h AS (SELECT 20 AS n),
               broken_h AS (SELECT no_such_col FROM shared_h),
               rec_s2 (n) AS (SELECT n FROM broken_h
                              UNION SELECT n + 1 FROM rec_s2
                              WHERE n < 21)
               SELECT * FROM rec_s2""",
        )
    assert spark.table("shared_h").collect()[0]["n"] == 10
    assert not spark.catalog.tableExists("broken_h")
    assert not spark.catalog.tableExists("rec_s2")

    # failure INSIDE the iteration (runaway recursion) also restores
    with pytest.raises(UnsupportedSQL, match="did not terminate"):
        run_recursive_sql(
            spark,
            """WITH RECURSIVE shared_h AS (SELECT 30 AS n),
               rec_s3 (n) AS (SELECT n FROM shared_h
                              UNION SELECT n + 1 FROM rec_s3)
               SELECT * FROM rec_s3""",
            max_iters=3,
        )
    assert spark.table("shared_h").collect()[0]["n"] == 10
    assert not spark.catalog.tableExists("rec_s3")

    # cleanup: drop the executor-owned view for other tests
    spark.catalog.dropTempView("shared_h")
    se._CTE_VIEW_NAMES.discard("shared_h")
    spark.catalog.dropTempView("rec_s")
    se._CTE_VIEW_NAMES.discard("rec_s")
