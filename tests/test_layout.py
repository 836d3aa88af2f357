"""Z-order layout: the pruning claim measured from real parquet
footers, never asserted. A z-ordered rewrite must (a) change zero
results, (b) keep BOTH clustered columns' row-group statistics tight
enough that a box predicate — or a predicate on the second column
alone, the case a single-key sort cannot prune at all — opens a small
fraction of the row groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.sources.layout import (
    ZORDER_BITS,
    linear_write,
    overlapping_groups,
    row_group_ranges,
    scale_to_cells,
    zorder_write,
    zvalue,
)

from .conftest import SF_SMALL

COLS = ["l_partkey", "l_suppkey"]


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """The same lineitem rows written twice: z-ordered on
    (l_partkey, l_suppkey) vs sorted on l_partkey alone."""
    root = tmp_path_factory.mktemp("layouts")
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", *COLS, "l_quantity"
    )
    z = zorder_write(li, str(root / "zorder"), COLS, n_files=8)
    lin = linear_write(li, str(root / "linear"), COLS[0], n_files=8)
    return li, z, lin


def test_zorder_rewrite_changes_no_results(spark, layouts):
    li, zpath, _ = layouts
    back = spark.read.parquet(zpath)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, li.collect())
    )


def _mid_box(li, frac=0.1):
    """A central box covering ~frac of each key's range."""
    box = {}
    for c in COLS:
        mn, mx = li.agg(F.min(c), F.max(c)).collect()[0]
        span = mx - mn
        lo = mn + int(span * (0.5 - frac / 2))
        box[c] = (lo, lo + int(span * frac))
    return box


def test_zorder_prunes_box_predicates_linear_sort_cannot(spark, layouts):
    """The headline measurement: for a 10%x10% box, the z-layout
    opens a small fraction of row groups; for a predicate on the
    SECOND key alone, the single-key sort prunes nothing (every row
    group spans the full l_suppkey range) while z-order still skips
    most of the table."""
    li, zpath, linpath = layouts
    zr = row_group_ranges(zpath, COLS)
    lr = row_group_ranges(linpath, COLS)
    assert len(zr) >= 8 and len(lr) >= 8

    box = _mid_box(li)
    z_open = overlapping_groups(zr, box)
    assert z_open / len(zr) <= 0.5, (
        f"z-order opened {z_open}/{len(zr)} row groups for a 10% box"
    )

    second_only = {COLS[1]: box[COLS[1]]}
    lin_open = overlapping_groups(lr, second_only)
    z_open2 = overlapping_groups(zr, second_only)
    assert lin_open == len(lr), "single-key sort cannot prune the 2nd key"
    assert z_open2 < len(zr), "z-order must prune on the 2nd key alone"
    assert z_open2 <= lin_open / 2, (
        f"z-order opened {z_open2}/{len(zr)} vs linear {lin_open}/{len(lr)}"
    )

    # and the single-key sort stays better on ITS OWN key — z-order
    # trades a little first-key locality for second-key prunability
    first_only = {COLS[0]: box[COLS[0]]}
    assert overlapping_groups(lr, first_only) <= overlapping_groups(
        zr, first_only
    )


def test_filtered_scan_result_is_layout_independent(spark, layouts):
    """Pruning is physical only: the same box filter over both
    layouts returns identical rows."""
    li, zpath, linpath = layouts
    box = _mid_box(li)
    pred = " AND ".join(
        f"{c} BETWEEN {lo} AND {hi}" for c, (lo, hi) in box.items()
    )
    a = spark.read.parquet(zpath).where(pred)
    b = spark.read.parquet(linpath).where(pred)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() > 0, "the box must actually select rows"


def test_zvalue_bit_interleave_matches_python_model(spark):
    """The JVM z-value expression against a pure-Python bit model —
    the same engine-portability pin the HLL/KMV sketches carry."""
    rows = [(a, b) for a in (0, 1, 5, 127, 255) for b in (0, 3, 64, 255)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", zvalue([F.col("a"), F.col("b")], ZORDER_BITS)
        ).collect()
    }

    def model(a, b):
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == model(a, b), (a, b, z, model(a, b))


def test_zvalue_guards(spark):
    with pytest.raises(ValueError, match="at least two"):
        zvalue([F.col("a")])
    with pytest.raises(ValueError, match="overflows"):
        zvalue([F.col("a")] * 4, bits=16)


def test_scale_to_cells_is_bounded(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    df, z = scale_to_cells(li, COLS)
    top = (1 << (2 * ZORDER_BITS)) - 1
    mn, mx = df.select(z.alias("z")).agg(F.min("z"), F.max("z")).collect()[0]
    assert 0 <= mn <= mx <= top


def test_ordered_export_global_order(spark, tmp_path):
    """The ordered export's contract: shards are disjoint key
    intervals and every shard file is internally sorted — so reading
    shards 0..7 in order replays one globally-sorted (i.e. one
    deterministic shuffled-epoch) pass. Verified against the raw
    parquet bytes (pyarrow preserves file row order)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from datafusion_delta_queries_spark.catalog import load_table
    from datafusion_delta_queries_spark.operators.curation import (
        ordered_export,
    )
    from tests.conftest import SF_SMALL

    out = str(tmp_path / "ordered")
    docs = load_table(spark, SF_SMALL, "documents")
    ordered_export(spark, docs, out)
    bounds = {}
    for d in sorted(glob.glob(os.path.join(out, "shard=*"))):
        shard = int(d.rsplit("=", 1)[1])
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, f"{d}: expected one sorted file per shard"
        t = pq.read_table(files[0])
        keys = t.column("sort_key").to_pylist()
        assert keys == sorted(keys), f"{d}: not internally sorted"
        bounds[shard] = (keys[0], keys[-1])
    shards = sorted(bounds)
    for a, b in zip(shards, shards[1:]):
        assert bounds[a][1] <= bounds[b][0], "shard intervals overlap"
    # deterministic: re-export to a second path → identical key order
    out2 = str(tmp_path / "ordered2")
    ordered_export(spark, docs, out2)
    for d in sorted(glob.glob(os.path.join(out, "shard=*"))):
        d2 = d.replace(out, out2)
        k1 = pq.read_table(glob.glob(os.path.join(d, "*.parquet"))[0])
        k2 = pq.read_table(glob.glob(os.path.join(d2, "*.parquet"))[0])
        assert k1.column("doc_id").to_pylist() == k2.column("doc_id").to_pylist()
