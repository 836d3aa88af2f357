"""Sketch aggregates: approximation error bounds vs exact answers.

approx_count_distinct (HyperLogLog++) and approx_percentile (quantile
sketch) are the one-pass, mergeable-partials forms of NDV and quantile
at 100 TB — exact distinct/percentile must shuffle or sort the world.
No SQL oracle (sketches are engine-specific by design); the gate is
bounded relative error against the in-repo exact computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_queries_spark.catalog import load_table

from .conftest import SF_SMALL


def test_hll_ndv_within_rsd(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).first()
    rel_err = abs(row.approx - row.exact) / row.exact
    assert rel_err < 0.05, f"HLL NDV off by {rel_err:.3%}"


def test_approx_percentile_close_to_exact(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx_p50"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(l_extendedprice, 0.99, 10000)").alias("approx_p99"),
    ).first()
    assert abs(row.approx_p50 - row.exact_p50) / row.exact_p50 < 0.02
    assert abs(row.approx_p99 - row.exact_p99) / row.exact_p99 < 0.02


def test_incremental_ndv_maintenance(spark):
    """Mergeable-HLL NDV: estimates from merged old+delta partials must
    land within the sketch's error bound of the exact per-group NDV —
    maintaining distinct counts from delta batches without rescanning
    the old snapshot (the approximate analog of delta_agg_maintenance).
    """
    from datafusion_delta_queries_spark.functions.sketches import (
        ndv_merge,
        ndv_partial,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    old = li.where("l_orderkey % 4 != 0")
    delta = li.where("l_orderkey % 4 = 0")

    merged = ndv_merge(
        ndv_partial(old, ["l_returnflag"], "l_partkey"),
        ndv_partial(delta, ["l_returnflag"], "l_partkey"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact")
    )
    rows = merged.join(exact, "l_returnflag").collect()
    assert rows
    for r in rows:
        assert abs(r.ndv - r.exact) / r.exact < 0.03, r


def test_ndv_merge_preserves_disjoint_groups(spark):
    """Groups present in only one partial survive the merge."""
    from datafusion_delta_queries_spark.functions.sketches import (
        ndv_merge,
        ndv_partial,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    a = ndv_partial(li.where("l_linenumber = 1"), ["l_linenumber"], "l_partkey")
    b = ndv_partial(li.where("l_linenumber = 2"), ["l_linenumber"], "l_partkey")
    got = {r.l_linenumber: r.ndv for r in ndv_merge(a, b).collect()}
    assert set(got) == {1, 2} and all(v > 0 for v in got.values())


# --- portable register-level HLL (functions/sketches.py) -----------------
#
# Register determinism and merge==rebuild are driver-oracle rows
# (sketch_hll_ndv, delta_hll_maintenance); here we gate what the
# oracle deliberately excludes — the float ESTIMATE's accuracy — plus
# the merge identity as a local property.

from datafusion_delta_queries_spark.functions.sketches import (  # noqa: E402
    hll_estimate,
    hll_merge_registers,
    hll_portable_registers,
    hll_summary,
)

from .conftest import SF_MED  # noqa: E402


def test_portable_hll_estimate_accuracy(spark):
    """p=8 gives ~6.5% RSD; demand < 15% (≈ 2.3 sigma) per group at
    NDV ≈ 1000 — loose enough to be stable, tight enough to catch any
    register-mapping bug (those throw estimates off by >2x)."""
    orders = load_table(spark, SF_MED, "orders")
    regs = hll_portable_registers(orders, ["o_orderpriority"], "o_custkey")
    est = hll_estimate(hll_summary(regs, ["o_orderpriority"]), ["o_orderpriority"])
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact")
    )
    rows = est.join(exact, "o_orderpriority").collect()
    assert rows
    for r in rows:
        rel = abs(r.ndv_est - r.exact) / r.exact
        assert rel < 0.15, f"{r.o_orderpriority}: est {r.ndv_est} vs {r.exact}"


def test_portable_hll_merge_equals_rebuild(spark):
    """Union-then-sketch == sketch-then-max-merge, register for
    register (the exact identity incremental maintenance relies on)."""
    orders = load_table(spark, SF_MED, "orders")
    lo = orders.where(F.col("o_orderkey") % 3 == 0)
    hi = orders.where(F.col("o_orderkey") % 3 != 0)
    merged = hll_merge_registers(
        hll_portable_registers(lo, ["o_orderpriority"], "o_custkey"),
        hll_portable_registers(hi, ["o_orderpriority"], "o_custkey"),
    )
    full = hll_portable_registers(orders, ["o_orderpriority"], "o_custkey")
    diff = merged.exceptAll(full).union(full.exceptAll(merged))
    assert diff.count() == 0


def test_portable_hll_register_bounds(spark):
    """bucket in [0, 256), rho in [1, 41] — the integer envelope the
    s_scaled arithmetic depends on for exactness."""
    orders = load_table(spark, SF_MED, "orders")
    regs = hll_portable_registers(orders, ["o_orderpriority"], "o_custkey")
    bad = regs.where(
        (F.col("bucket") < 0) | (F.col("bucket") >= 256)
        | (F.col("rho") < 1) | (F.col("rho") > 41)
    )
    assert bad.count() == 0


# --- portable KMV (bottom-k) sketch ---------------------------------------

from datafusion_delta_queries_spark.functions.sketches import (  # noqa: E402
    KMV_K,
    kmv_estimates,
    kmv_pair_overlap,
    kmv_signature,
)


def test_kmv_jaccard_and_intersection_accuracy(spark):
    """k=256 → RSE ≈ 6%; demand Jaccard within 0.12 absolute and
    intersection within 30% relative per year pair (measured worst
    case at this fixture: 0.061 / 17%) — loose enough for stability,
    tight enough that any ranking or membership bug fails."""
    orders = load_table(spark, SF_MED, "orders")
    base = orders.select(F.year("o_orderdate").alias("yr"), "o_custkey")
    stats = kmv_pair_overlap(kmv_signature(base, ["yr"], "o_custkey"), "yr")
    est = {(r.g1, r.g2): r for r in kmv_estimates(stats).collect()}

    mem = base.distinct()
    exact = (
        mem.alias("a")
        .join(
            mem.alias("b"),
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.yr") < F.col("b.yr")),
        )
        .groupBy(F.col("a.yr").alias("g1"), F.col("b.yr").alias("g2"))
        .agg(F.count("*").alias("inter"))
        .collect()
    )
    sizes = {r.yr: r.n for r in mem.groupBy("yr").agg(F.count("*").alias("n")).collect()}
    assert exact
    for r in exact:
        union = sizes[r.g1] + sizes[r.g2] - r.inter
        jac = r.inter / union
        e = est[(r.g1, r.g2)]
        assert abs(e.jaccard_est - jac) < 0.12, (r.g1, r.g2, e.jaccard_est, jac)
        assert abs(e.inter_est - r.inter) / r.inter < 0.30, (
            r.g1, r.g2, e.inter_est, r.inter,
        )


def test_kmv_signature_merge_equals_rebuild(spark):
    """Bottom-k of a union == bottom-k of the concatenated signatures,
    hash for hash — the exact mergeability maintenance relies on."""
    from pyspark.sql.window import Window

    orders = load_table(spark, SF_MED, "orders")
    base = orders.select(F.year("o_orderdate").alias("yr"), "o_custkey")
    lo = base.where(F.col("o_custkey") % 2 == 0)
    hi = base.where(F.col("o_custkey") % 2 != 0)
    merged_in = kmv_signature(lo, ["yr"], "o_custkey").unionByName(
        kmv_signature(hi, ["yr"], "o_custkey")
    ).select("yr", "h").distinct()
    w = Window.partitionBy("yr").orderBy("h")
    merged = (
        merged_in.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KMV_K)
    )
    full = kmv_signature(base, ["yr"], "o_custkey")
    diff = merged.exceptAll(full).union(full.exceptAll(merged))
    assert diff.count() == 0


# --- bit-level portability pin: Spark mapping vs pure-Python md5 ----------


def test_portable_hll_registers_match_python_bit_model(spark):
    """The (bucket, rho) mapping must equal an independent bit-level
    model: bucket = first byte of md5, rho = 1 + leading zero bits of
    the next 56, capped at 41. Any divergence (endianness, off-by-one
    in the zchars CASE, cap slip) breaks cross-engine oracles."""
    import hashlib

    values = [str(v) for v in range(2000)]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    regs = hll_portable_registers(df.withColumn("g", F.lit("x")), ["g"], "v")
    got = {r.bucket: r.rho for r in regs.collect()}

    expect = {}
    for v in values:
        h = hashlib.md5(v.encode()).hexdigest()
        bucket = int(h[:2], 16)
        suffix_bits = bin(int(h[2:16], 16))[2:].zfill(56)
        rho = min(57 if "1" not in suffix_bits else suffix_bits.index("1") + 1, 41)
        expect[bucket] = max(expect.get(bucket, 0), rho)
    assert got == expect


def test_kmv_signature_matches_python_bit_model(spark):
    """KMV signature == the k smallest md5 hex digests, verbatim."""
    import hashlib

    values = list(range(3000))
    df = spark.createDataFrame([(v,) for v in values], "v long")
    sig = kmv_signature(df.withColumn("g", F.lit("x")), ["g"], "v")
    got = [r.h for r in sig.orderBy("rk").collect()]
    expect = sorted(hashlib.md5(str(v).encode()).hexdigest() for v in set(values))[
        :KMV_K
    ]
    assert got == expect


def test_continuous_hll_noop_refresh_leaves_state_untouched(spark, tmp_path):
    """A batch that raises no register (values already absorbed) must
    skip the state write entirely — byte-identical files — while a
    raising batch lands on the full rebuild exactly."""
    import os

    from datafusion_delta_queries_spark.operators.sketch_queries import (
        ContinuousHllNdv,
    )

    state = str(tmp_path / "hll")
    orders = load_table(spark, SF_SMALL, "orders")
    view = ContinuousHllNdv(spark, state, ["o_orderpriority"], "o_custkey")
    view.initialize(orders)

    def state_bytes():
        return {
            f: open(os.path.join(state, f), "rb").read()
            for f in sorted(os.listdir(state))
            if f.endswith(".parquet")
        }

    before = state_bytes()
    view.refresh(orders.limit(200))  # re-feed absorbed values
    assert state_bytes() == before

    view.refresh(orders.withColumn("o_custkey", F.col("o_custkey") + 1000000))
    merged = {
        (r.o_orderpriority, r.bucket): r.rho
        for r in spark.read.parquet(state).collect()
    }
    full = hll_portable_registers(
        orders.select("o_orderpriority", "o_custkey").unionByName(
            orders.select(
                "o_orderpriority",
                (F.col("o_custkey") + 1000000).alias("o_custkey"),
            )
        ),
        ["o_orderpriority"],
        "o_custkey",
    )
    expect = {(r.o_orderpriority, r.bucket): r.rho for r in full.collect()}
    assert merged == expect


def test_portable_sketches_ignore_null_values(spark):
    """NULLs carry no distinct value: registers and signatures over a
    column with NULLs equal those over the non-null subset (previously
    a NULL leaked a (bucket NULL, rho 41) register / a rank-1 NULL
    signature slot)."""
    withnull = spark.createDataFrame(
        [("g", str(v)) for v in range(500)] + [("g", None)] * 3,
        "g string, v string",
    )
    clean = withnull.where(F.col("v").isNotNull())

    r1 = sorted(map(tuple, hll_portable_registers(withnull, ["g"], "v").collect()))
    r2 = sorted(map(tuple, hll_portable_registers(clean, ["g"], "v").collect()))
    assert r1 == r2 and all(b is not None for _, b, _ in r1)

    s1 = [r.h for r in kmv_signature(withnull, ["g"], "v").orderBy("rk").collect()]
    s2 = [r.h for r in kmv_signature(clean, ["g"], "v").orderBy("rk").collect()]
    assert s1 == s2 and None not in s1


# -- Count-Min sketch: the retraction-capable synopsis ------------------

from datafusion_delta_queries_spark.functions.sketches import (  # noqa: E402
    CMS_D,
    CMS_W,
    cms_counters,
    cms_merge,
    cms_point_estimate,
)


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """The CMS guarantees: est >= exact for EVERY key (a key's own
    occurrences always land in its counters), and overcount is
    collision mass — bounded here at e*N/W per the standard analysis,
    checked for all order customers at once."""
    orders = load_table(spark, SF_SMALL, "orders")
    n = orders.count()
    counters = cms_counters(orders, [], "o_custkey")
    exact = orders.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("exact_cnt")
    )
    est = cms_point_estimate(counters, exact, [], "o_custkey")
    joined = exact.join(est, "o_custkey")
    bad = joined.where(F.col("est") < F.col("exact_cnt")).count()
    assert bad == 0, "CMS must never undercount"
    import math

    bound = math.e * n / CMS_W
    worst = joined.agg(
        F.max(F.col("est") - F.col("exact_cnt")).alias("w")
    ).collect()[0]["w"]
    assert worst <= bound, f"overcount {worst} exceeds e*N/W = {bound:.1f}"


def test_cms_merge_equals_rebuild_and_retracts(spark):
    """Linearity both ways: counters(a ∪ b) == merge(counters(a),
    counters(b)), and merging a NEGATED delta takes the state back —
    the inverse HLL/KMV don't have."""
    orders = load_table(spark, SF_SMALL, "orders")
    a = orders.where("o_orderkey % 3 = 0")
    b = orders.where("o_orderkey % 3 <> 0")
    both = cms_counters(orders, [], "o_custkey")
    merged = cms_merge(
        cms_counters(a, [], "o_custkey"), cms_counters(b, [], "o_custkey")
    )
    ms = lambda df: sorted(map(tuple, df.collect()))
    assert ms(merged) == ms(both.where("cnt <> 0"))
    # retract b: back to exactly counters(a)
    neg_b = cms_counters(b, [], "o_custkey", weight=F.lit(-1))
    assert ms(cms_merge(both, neg_b)) == ms(
        cms_counters(a, [], "o_custkey").where("cnt <> 0")
    )


def test_cms_over_retraction_fails_loudly(spark):
    """Retracting rows the history never inserted drives a counter
    negative: the merge plan raises instead of returning a corrupt
    sketch."""
    import pytest as _pytest

    df = spark.createDataFrame([("a",), ("b",)], "k: string")
    state = cms_counters(df, [], "k")
    over = cms_counters(
        spark.createDataFrame([("a",), ("a",)], "k: string"),
        [],
        "k",
        weight=F.lit(-1),
    )
    with _pytest.raises(Exception, match="corrupt CMS history"):
        cms_merge(state, over).collect()


def test_cms_counter_table_is_fixed_size(spark):
    """State never exceeds CMS_D x CMS_W rows however large the input
    — the property that makes the sketch shippable as broadcast state
    at 100 TB."""
    orders = load_table(spark, SF_SMALL, "orders")
    counters = cms_counters(orders, [], "o_custkey")
    assert counters.count() <= CMS_D * CMS_W
    rows = counters.agg(F.countDistinct("row").alias("d")).collect()[0]["d"]
    assert rows == CMS_D


# -- Stored continuous CMS lifecycle ------------------------------------


def test_continuous_cms_signed_lifecycle(spark, tmp_path):
    """Initialize from a base, refresh with a signed batch holding an
    insert, a full retraction (its counters must LEAVE the state
    table), and a repeat — state on disk equals the rebuild over the
    post-change multiset exactly."""
    from datafusion_delta_queries_spark.operators.sketch_queries import (
        ContinuousCms,
    )

    base = spark.createDataFrame([("a",), ("b",), ("b",)], "k: string")
    view = ContinuousCms(spark, str(tmp_path / "state"), [], "k")
    view.initialize(base)
    batch = spark.createDataFrame(
        [("a", -1), ("c", 1), ("c", 1)], "k: string, _sign: int"
    )
    view.refresh_signed(batch)
    got = sorted(map(tuple, view.read_counters().collect()))
    # post-change multiset: b x2, c x2
    want_df = cms_counters(
        spark.createDataFrame([("b",), ("b",), ("c",), ("c",)], "k: string"),
        [],
        "k",
    )
    assert got == sorted(map(tuple, want_df.collect()))
    # 'a' is fully retracted: none of its counters may linger at 0
    assert all(cnt != 0 for *_, cnt in got)


def test_continuous_cms_noop_refresh_leaves_state_untouched(spark, tmp_path):
    import os

    from datafusion_delta_queries_spark.operators.sketch_queries import (
        ContinuousCms,
    )

    base = spark.createDataFrame([("a",), ("b",)], "k: string")
    view = ContinuousCms(spark, str(tmp_path / "state"), [], "k")
    view.initialize(base)
    files_before = sorted(os.listdir(tmp_path / "state"))
    empty = spark.createDataFrame([], "k: string, _sign: int")
    view.refresh_signed(empty)
    assert sorted(os.listdir(tmp_path / "state")) == files_before


def test_continuous_cms_over_retraction_fails_loudly(spark, tmp_path):
    import pytest as _pytest

    from datafusion_delta_queries_spark.operators.sketch_queries import (
        ContinuousCms,
    )

    base = spark.createDataFrame([("a",)], "k: string")
    view = ContinuousCms(spark, str(tmp_path / "state"), [], "k")
    view.initialize(base)
    over = spark.createDataFrame(
        [("a", -1), ("a", -1)], "k: string, _sign: int"
    )
    with _pytest.raises(Exception, match="corrupt CMS history"):
        view.refresh_signed(over)
