"""Structured Streaming realization tests (SURVEY §7 step 5).

Prove the three claims the module makes:
1. a streaming plan over the stateless subset equals the batch plan
   over the same data (unified-API contract);
2. with a reused checkpoint, a re-run processes ONLY newly appended
   files — the executable PosDeltaScan semantics;
3. watermarked append-mode windows emit exactly the windows whose end
   the final watermark passed.
"""

from __future__ import annotations

import os

import pytest

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.plans.nodes import Filter, Join, Projection, Scan, Union
from datafusion_delta_queries_spark.streaming import (
    compile_streaming,
    incremental_new_rows,
    watermarked_tumbling_counts,
)
from datafusion_delta_queries_spark.streaming.incremental import (
    UnsupportedStreamingOperator,
)

from .conftest import SF_SMALL

IR = Projection(
    ["o_orderkey", "o_custkey", "round(o_totalprice, 2) AS total"],
    Filter("o_totalprice > 200000", Scan("orders")),
)


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def orders_stream_dir(spark, tmp_path):
    """Orders split into two parquet 'arrival batches' in a tmp dir."""
    orders = load_table(spark, SF_SMALL, "orders")
    d = str(tmp_path / "orders_stream")
    orders.where("o_orderkey % 2 = 0").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "batch=1")
    )
    orders.where("o_orderkey % 2 = 1").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "batch=2")
    )
    return d, orders


def test_streaming_matches_batch(spark, tmp_path, orders_stream_dir):
    d, orders = orders_stream_dir
    dirs = {"orders": os.path.join(d, "*")}
    schemas = {"orders": orders.schema}
    stream = compile_streaming(IR, spark, dirs, schemas)
    assert stream.isStreaming
    from datafusion_delta_queries_spark.streaming import run_stream_to_table

    got = _multiset(run_stream_to_table(stream))
    want = _multiset(
        orders.where("o_totalprice > 200000").selectExpr(
            "o_orderkey", "o_custkey", "round(o_totalprice, 2) AS total"
        )
    )
    assert got == want and len(got) > 0


def test_incremental_processes_only_new_files(spark, tmp_path):
    """Checkpointed re-run = PosDeltaScan: only appended rows flow."""
    orders = load_table(spark, SF_SMALL, "orders")
    d = str(tmp_path / "inc")
    ckpt = str(tmp_path / "ckpt")
    dirs, schemas = {"orders": d}, {"orders": orders.schema}

    first = orders.where("o_orderkey % 3 = 0")
    first.coalesce(1).write.mode("overwrite").parquet(os.path.join(d))
    got1 = _multiset(incremental_new_rows(IR, spark, dirs, schemas, ckpt))
    want1 = _multiset(
        first.where("o_totalprice > 200000").selectExpr(
            "o_orderkey", "o_custkey", "round(o_totalprice, 2) AS total"
        )
    )
    assert got1 == want1 and len(got1) > 0

    second = orders.where("o_orderkey % 3 = 1")
    second.coalesce(1).write.mode("append").parquet(os.path.join(d))
    got2 = _multiset(incremental_new_rows(IR, spark, dirs, schemas, ckpt))
    want2 = _multiset(
        second.where("o_totalprice > 200000").selectExpr(
            "o_orderkey", "o_custkey", "round(o_totalprice, 2) AS total"
        )
    )
    # ONLY the new batch's rows — nothing from the first run re-emitted.
    assert got2 == want2 and len(got2) > 0


def test_streaming_union(spark, tmp_path, orders_stream_dir):
    d, orders = orders_stream_dir
    ir = Union(
        [
            Projection(["o_orderkey AS k", "'lo' AS band"],
                       Filter("o_totalprice <= 100000", Scan("orders"))),
            Projection(["o_orderkey AS k", "'hi' AS band"],
                       Filter("o_totalprice > 400000", Scan("orders"))),
        ]
    )
    dirs = {"orders": os.path.join(d, "*")}
    schemas = {"orders": orders.schema}
    from datafusion_delta_queries_spark.streaming import run_stream_to_table

    got = _multiset(run_stream_to_table(compile_streaming(ir, spark, dirs, schemas)))
    want = _multiset(
        orders.where("o_totalprice <= 100000")
        .selectExpr("o_orderkey AS k", "'lo' AS band")
        .unionByName(
            orders.where("o_totalprice > 400000").selectExpr(
                "o_orderkey AS k", "'hi' AS band"
            )
        )
    )
    assert got == want and len(got) > 0


def test_streaming_join_refused(spark):
    ir = Join(Scan("a"), Scan("b"), on=[("x", "x")])
    with pytest.raises(UnsupportedStreamingOperator):
        compile_streaming(ir, spark, {}, {})


def test_watermarked_window_append_mode(spark, tmp_path):
    """Append-mode emits exactly the windows the final watermark passed."""
    from datafusion_delta_queries_spark.streaming import run_stream_to_table
    from pyspark.sql import functions as F

    events = load_table(spark, SF_SMALL, "events")
    d = str(tmp_path / "events_stream")
    events.coalesce(2).write.mode("overwrite").parquet(d)
    written = spark.read.parquet(d)

    stream = spark.readStream.schema(written.schema).parquet(d)
    agg = watermarked_tumbling_counts(stream, delay="1 hour", width="10 minutes")
    got = _multiset(run_stream_to_table(agg, output_mode="append"))

    batch_all = watermarked_tumbling_counts(written, delay="1 hour", width="10 minutes")
    max_ts = written.agg(F.max("ts")).collect()[0][0]
    want = _multiset(
        batch_all.where(
            F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
        )
    )
    assert len(got) > 0
    assert got == want


def test_streamed_continuous_aggregate_checkpointed_rerun(spark, tmp_path):
    """The maintain_agg_of_sql spec realized as readStream+foreachBatch:
    each micro-batch refreshes the stored partial state, and a restart
    on the same checkpoint processes ONLY newly-arrived files — the
    stored table equals the batch recompute after every drain, which
    fails if history were rescanned (double-counted sums) or dropped."""
    from pyspark.sql import functions as F

    from datafusion_delta_queries_spark.operators.continuous_agg import (
        ContinuousAggregate,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sql = (
        "SELECT o_orderpriority, count(*) AS n_orders, "
        "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents "
        "FROM orders GROUP BY o_orderpriority"
    )
    base = orders.where("o_orderkey % 3 = 0")
    b1 = orders.where("o_orderkey % 3 = 1")
    b2 = orders.where("o_orderkey % 3 = 2")

    view = ContinuousAggregate(spark, str(tmp_path / "state"), sql)
    view.initialize(base)

    def state():
        return {
            r["o_orderpriority"]: (r["n_orders"], r["cents"])
            for r in view.read().collect()
        }

    def recompute(df):
        return {
            r["o_orderpriority"]: (r["n_orders"], r["cents"])
            for r in df.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(
                    F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                ).alias("cents"),
            )
            .collect()
        }

    b1.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_into(src, orders.schema, ckpt)
    q.awaitTermination(120)
    assert state() == recompute(base.unionByName(b1))

    # Restart on the same checkpoint after more files arrive: only the
    # new batch flows (a rescan would double-count b1's cents).
    b2.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_into(src, orders.schema, ckpt)
    q.awaitTermination(120)
    assert state() == recompute(orders)


def test_streamed_cdf_continuous_aggregate_with_retractions(spark, tmp_path):
    """stream_into_cdf: change files (inserts + deletes + updates) flow
    through refresh_signed per micro-batch; a checkpointed restart
    processes only newly-arrived change files; a group retracted to
    zero leaves the stored table. This is Spark's IncrementalExecution
    driving the SIGNED algebra — the retraction analog of the test
    above."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_delta_queries_spark.operators.continuous_agg import (
        ContinuousAggregate,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    src = str(tmp_path / "cdf_src")
    ckpt = str(tmp_path / "ckpt")
    sql = (
        "SELECT o_orderpriority, count(*) AS n_orders, "
        "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents "
        "FROM orders GROUP BY o_orderpriority"
    )
    base = orders.where("o_orderkey % 3 IN (0, 1)")
    view = ContinuousAggregate(spark, str(tmp_path / "state"), sql)
    view.initialize(base)

    cdf_schema = T.StructType(
        orders.schema.fields
        + [T.StructField("_change_type", T.StringType())]
    )

    def state():
        return {
            r["o_orderpriority"]: (r["n_orders"], r["cents"])
            for r in view.read().collect()
        }

    def recompute(df):
        return {
            r["o_orderpriority"]: (r["n_orders"], r["cents"])
            for r in df.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(
                    F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                ).alias("cents"),
            )
            .collect()
        }

    # Change file 1: insert the %3=2 rows, delete the %3=0 rows, and
    # update the %3=1 rows into a brand-new priority group.
    moved = orders.where("o_orderkey % 3 = 1").withColumn(
        "o_orderpriority", F.lit("9-STREAMED")
    )
    c1 = (
        orders.where("o_orderkey % 3 = 2")
        .withColumn("_change_type", F.lit("insert"))
        .unionByName(
            orders.where("o_orderkey % 3 = 0")
            .withColumn("_change_type", F.lit("delete"))
        )
        .unionByName(
            orders.where("o_orderkey % 3 = 1")
            .withColumn("_change_type", F.lit("update_preimage"))
        )
        .unionByName(moved.withColumn("_change_type", F.lit("update_postimage")))
    )
    c1.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_into_cdf(src, cdf_schema, ckpt)
    q.awaitTermination(120)
    s1 = orders.where("o_orderkey % 3 = 2").unionByName(moved)
    assert state() == recompute(s1)

    # Change file 2 arrives; restart on the SAME checkpoint: only the
    # new file flows (a rescan would double-delete). It retracts every
    # '9-STREAMED' row — that group must vanish from the state table.
    c2 = moved.withColumn("_change_type", F.lit("delete"))
    c2.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_into_cdf(src, cdf_schema, ckpt)
    q.awaitTermination(120)
    s2 = orders.where("o_orderkey % 3 = 2")
    assert state() == recompute(s2)
    assert "9-STREAMED" not in state()


def test_streamed_cdf_minmax_with_base_reader(spark, tmp_path):
    """Streaming extrema: stream_into_cdf with a base_reader maintains
    a min() statement under retractions — deletes that kill a group's
    stored minimum repair from the producer-maintained base table
    (two-tier: only threatened groups touch it), and a checkpointed
    restart processes only the new change file."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_delta_queries_spark.operators.continuous_agg import (
        ContinuousAggregate,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    src = str(tmp_path / "cdf_src")
    ckpt = str(tmp_path / "ckpt")
    base_dir = str(tmp_path / "base")
    sql = (
        "SELECT o_orderpriority, count(*) AS n_orders, "
        "min(o_totalprice) AS lo, max(o_totalprice) AS hi "
        "FROM orders GROUP BY o_orderpriority"
    )
    s0 = orders.where("o_orderkey % 3 IN (0, 1)")
    view = ContinuousAggregate(spark, str(tmp_path / "state"), sql)
    view.initialize(s0)

    cdf_schema = T.StructType(
        orders.schema.fields
        + [T.StructField("_change_type", T.StringType())]
    )

    def base_reader():
        return spark.read.schema(orders.schema).parquet(base_dir)

    def state():
        return {
            r["o_orderpriority"]: (r["n_orders"], r["lo"], r["hi"])
            for r in view.read().collect()
        }

    def recompute(df):
        return {
            r["o_orderpriority"]: (r["n_orders"], r["lo"], r["hi"])
            for r in df.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.min("o_totalprice").alias("lo"),
                F.max("o_totalprice").alias("hi"),
            )
            .collect()
        }

    # Batch 1: delete the %3=0 rows (statistically certain to include
    # several groups' stored extrema → recompute tier) and insert the
    # %3=2 rows (new extrema merge algebraically where unthreatened).
    # The producer updates the base table BEFORE emitting the change
    # file — the contract base_reader documents.
    s1 = orders.where("o_orderkey % 3 IN (1, 2)")
    s1.write.mode("overwrite").parquet(base_dir)
    c1 = (
        orders.where("o_orderkey % 3 = 2")
        .withColumn("_change_type", F.lit("insert"))
        .unionByName(
            orders.where("o_orderkey % 3 = 0")
            .withColumn("_change_type", F.lit("delete"))
        )
    )
    c1.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_into_cdf(src, cdf_schema, ckpt, base_reader=base_reader)
    q.awaitTermination(120)
    assert state() == recompute(s1)

    # Batch 2 on the SAME checkpoint: delete every %3=1 row — more
    # extrema retract, groups shrink; only the new file flows.
    s2 = orders.where("o_orderkey % 3 = 2")
    s2.write.mode("overwrite").parquet(base_dir)
    c2 = orders.where("o_orderkey % 3 = 1").withColumn(
        "_change_type", F.lit("delete")
    )
    c2.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_into_cdf(src, cdf_schema, ckpt, base_reader=base_reader)
    q.awaitTermination(120)
    assert state() == recompute(s2)


def test_stream_into_cdf_rejects_minmax(spark, tmp_path):
    from pyspark.sql import types as T

    from datafusion_delta_queries_spark.operators.continuous_agg import (
        ContinuousAggregate,
    )
    from datafusion_delta_queries_spark.plans import UnsupportedSQL

    orders = load_table(spark, SF_SMALL, "orders")
    view = ContinuousAggregate(
        spark, str(tmp_path / "state"),
        "SELECT o_orderpriority, min(o_totalprice) AS lo "
        "FROM orders GROUP BY o_orderpriority",
    )
    view.initialize(orders)
    cdf_schema = T.StructType(
        orders.schema.fields + [T.StructField("_change_type", T.StringType())]
    )
    with pytest.raises(UnsupportedSQL, match="change stream"):
        view.stream_into_cdf(str(tmp_path / "src"), cdf_schema, str(tmp_path / "c"))


def test_streamed_cdf_join_view_with_retractions(spark, tmp_path):
    """The JOIN continuous aggregate driven from a stream of fact-side
    CDF files: each micro-batch joins the static dim inside
    refresh_signed, a checkpointed restart processes only new change
    files, and sum/count state (no min/max — rejected on a pure change
    stream) maintains exactly under deletes and key-moving updates."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_delta_queries_spark.operators.continuous_agg import (
        ContinuousJoinAggregate,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    src = str(tmp_path / "cdf_src")
    ckpt = str(tmp_path / "ckpt")
    sql = (
        "SELECT o.o_orderpriority, count(*) AS n_lines, "
        "sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o.o_orderpriority"
    )
    view = ContinuousJoinAggregate(
        spark, str(tmp_path / "state"), sql,
        fact="lineitem", dims={"orders": orders},
    )
    base = li.where("l_orderkey % 3 IN (0, 1)")
    view.initialize(base)

    cdf_schema = T.StructType(
        li.schema.fields + [T.StructField("_change_type", T.StringType())]
    )

    def state():
        return {
            r["o_orderpriority"]: (r["n_lines"], r["cents"])
            for r in view.read().collect()
        }

    def recompute(fact):
        return {
            r["o_orderpriority"]: (r["n_lines"], r["cents"])
            for r in fact.join(
                orders, fact["l_orderkey"] == orders["o_orderkey"]
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_lines"),
                F.sum(
                    F.expr(
                        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
                    )
                ).alias("cents"),
            )
            .collect()
        }

    # Change file 1: insert %3=2 lines, delete %3=0 lines, move %3=1
    # lines to the NEXT order (join-key rewrite -> different priority).
    moved = li.where("l_orderkey % 3 = 1").withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(1)
    )
    c1 = (
        li.where("l_orderkey % 3 = 2")
        .withColumn("_change_type", F.lit("insert"))
        .unionByName(
            li.where("l_orderkey % 3 = 0")
            .withColumn("_change_type", F.lit("delete"))
        )
        .unionByName(
            li.where("l_orderkey % 3 = 1")
            .withColumn("_change_type", F.lit("update_preimage"))
        )
        .unionByName(
            moved.withColumn("_change_type", F.lit("update_postimage"))
        )
    )
    c1.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_into_cdf(src, cdf_schema, ckpt)
    q.awaitTermination(120)
    s1 = li.where("l_orderkey % 3 = 2").unionByName(moved)
    assert state() == recompute(s1)

    # Change file 2; restart on the SAME checkpoint: only the new file
    # flows. Retract every moved line.
    c2 = moved.withColumn("_change_type", F.lit("delete"))
    c2.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_into_cdf(src, cdf_schema, ckpt)
    q.awaitTermination(120)
    assert state() == recompute(li.where("l_orderkey % 3 = 2"))


def test_streamed_dim_cdf_join_view(spark, tmp_path):
    """Slowly-changing dimension as a change feed: DIM-side CDF files
    stream through refresh_dim_signed — order deletes retract their
    lines, priority rewrites move lines between groups, and the
    checkpointed restart processes only the new change file against
    the producer-updated dim table."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_delta_queries_spark.operators.continuous_agg import (
        ContinuousJoinAggregate,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    src = str(tmp_path / "dim_cdf_src")
    ckpt = str(tmp_path / "ckpt")
    dim_dir = str(tmp_path / "dim")
    sql = (
        "SELECT o.o_orderpriority, count(*) AS n_lines, "
        "sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o.o_orderpriority"
    )
    d0 = orders.where("o_orderkey % 4 <> 0")
    d0.write.parquet(dim_dir + "/v0")
    view = ContinuousJoinAggregate(
        spark, str(tmp_path / "state"), sql,
        fact="lineitem",
        dims={"orders": spark.read.parquet(dim_dir + "/v0")},
    )
    view.initialize(li)

    cdf_schema = T.StructType(
        orders.schema.fields
        + [T.StructField("_change_type", T.StringType())]
    )
    current = {"v": "v0"}

    def dim_reader():
        return spark.read.parquet(dim_dir + "/" + current["v"])

    def state():
        return {
            r["o_orderpriority"]: (r["n_lines"], r["cents"])
            for r in view.read().collect()
        }

    def recompute(dim):
        return {
            r["o_orderpriority"]: (r["n_lines"], r["cents"])
            for r in li.join(dim, li["l_orderkey"] == dim["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_lines"),
                F.sum(F.expr(
                    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
                )).alias("cents"),
            )
            .collect()
        }

    # Dim batch 1: insert the missing %4=0 orders (their lines join
    # in) and reclassify the %4=1 orders' priority (lines move).
    pre = orders.where("o_orderkey % 4 = 1")
    post = pre.withColumn("o_orderpriority", F.lit("9-DIMSTREAM"))
    d1 = orders.where("o_orderkey % 4 IN (0, 2, 3)").unionByName(post)
    d1.write.parquet(dim_dir + "/v1")
    current["v"] = "v1"
    c1 = (
        orders.where("o_orderkey % 4 = 0")
        .withColumn("_change_type", F.lit("insert"))
        .unionByName(pre.withColumn("_change_type", F.lit("update_preimage")))
        .unionByName(post.withColumn("_change_type", F.lit("update_postimage")))
    )
    c1.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_dim_cdf(
        "orders", src, cdf_schema, ckpt,
        fact_reader=lambda: li, dim_reader=dim_reader,
    )
    q.awaitTermination(120)
    assert state() == recompute(d1)
    assert "9-DIMSTREAM" in state()

    # Dim batch 2 on the SAME checkpoint: delete the reclassified
    # orders — the group must vanish; only the new file flows.
    d2 = orders.where("o_orderkey % 4 IN (0, 2, 3)")
    d2.write.parquet(dim_dir + "/v2")
    current["v"] = "v2"
    c2 = post.withColumn("_change_type", F.lit("delete"))
    c2.coalesce(1).write.mode("append").parquet(src)
    q = view.stream_dim_cdf(
        "orders", src, cdf_schema, ckpt,
        fact_reader=lambda: li, dim_reader=dim_reader,
    )
    q.awaitTermination(120)
    assert state() == recompute(d2)
    assert "9-DIMSTREAM" not in state()


def test_streamed_cdf_rollup_cascade(spark, tmp_path):
    """The cascade driven from a checkpointed CDF stream: each change
    file refreshes the hourly tier AND re-merges the touched days'
    coarse partials; a restart on the same checkpoint applies only the
    new file; a replayed drain is a no-op (shared replay guard); the
    daily view equals the direct recompute after every drain."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_delta_queries_spark.operators.continuous_agg import (
        ContinuousRollupCascade,
    )
    from datafusion_delta_queries_spark.operators.signed_queries import (
        _CASCADE_SQL,
    )

    ev = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "cdf_src")
    ckpt = str(tmp_path / "ckpt")
    view = ContinuousRollupCascade(
        spark, str(tmp_path / "casc"), _CASCADE_SQL,
        fine_key="bucket_h", coarse_key="bucket_d",
        coarse_expr="date_trunc('day', bucket_h)",
    )
    base = ev.where("event_id % 3 = 0")
    view.initialize(base)

    cdf_schema = T.StructType(
        ev.schema.fields + [T.StructField("_change_type", T.StringType())]
    )

    def daily():
        return {
            (r["bucket_d"], r["event_type"]): (r["n_events"], r["value_cents"])
            for r in view.read().collect()
        }

    def recompute(df):
        return {
            (r["bucket_d"], r["event_type"]): (r["n_events"], r["cents"])
            for r in df.groupBy(
                F.date_trunc("day", "ts").alias("bucket_d"), "event_type"
            ).agg(
                F.count("*").alias("n_events"),
                F.sum(
                    F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
                ).alias("cents"),
            ).collect()
        }

    # file 1: insert the %3=1 slice; file arrives, stream drains
    c1 = ev.where("event_id % 3 = 1").withColumn(
        "_change_type", F.lit("insert")
    )
    c1.coalesce(1).write.mode("append").parquet(src)
    s1 = ev.where("event_id % 3 IN (0, 1)")
    view.stream_cdf(
        src, cdf_schema, ckpt, base_reader=lambda: s1
    ).awaitTermination(120)
    assert daily() == recompute(s1)

    # file 2: delete the %9=0 slice; restart on the SAME checkpoint —
    # only the new file flows (a rescan would double-apply file 1)
    c2 = s1.where("event_id % 9 = 0").withColumn(
        "_change_type", F.lit("delete")
    )
    c2.coalesce(1).write.mode("append").parquet(src)
    s2 = s1.where("event_id % 9 <> 0")
    view.stream_cdf(
        src, cdf_schema, ckpt, base_reader=lambda: s2
    ).awaitTermination(120)
    assert daily() == recompute(s2)

    # replayed drain with nothing new: no-op (replay guard + ckpt)
    view.stream_cdf(
        src, cdf_schema, ckpt, base_reader=lambda: s2
    ).awaitTermination(120)
    assert daily() == recompute(s2)
