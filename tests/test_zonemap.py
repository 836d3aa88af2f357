"""Zone-map index: file-list pruning measured, incremental refresh
proven footer-minimal, and correctness never depending on the index
(the residual filter makes false inclusions harmless)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.sources.layout import zorder_write
from datafusion_delta_queries_spark.sources.zonemap import ZoneMapIndex

from .conftest import SF_SMALL

COLS = ["l_partkey", "l_suppkey"]


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("zm")
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", *COLS, "l_quantity"
    )
    table = str(root / "table")
    zorder_write(li, table, COLS, n_files=8)
    zm = ZoneMapIndex(spark, str(root / "state"), table, COLS)
    n = zm.build()
    return li, table, zm, n


def _box(li, frac=0.1):
    box = {}
    for c in COLS:
        mn, mx = li.agg(F.min(c), F.max(c)).collect()[0]
        span = mx - mn
        lo = mn + int(span * (0.5 - frac / 2))
        box[c] = (lo, lo + int(span * frac))
    return box


def test_pruned_scan_equals_full_filter(spark, indexed):
    li, table, zm, _ = indexed
    box = _box(li)
    pred = " AND ".join(
        f"{c} BETWEEN {lo} AND {hi}" for c, (lo, hi) in box.items()
    )
    got = sorted(map(tuple, zm.read_pruned(box).collect()))
    want = sorted(map(tuple, spark.read.parquet(table).where(pred).collect()))
    assert got == want and got


def test_index_actually_skips_files(spark, indexed):
    """The payoff: over the z-ordered layout, a 10% box opens a
    strict minority of the files, and the scan's input files are
    exactly the selected ones."""
    li, table, zm, n = indexed
    box = _box(li)
    names = zm.select_files(box)
    assert 0 < len(names) <= n / 2, f"opened {len(names)}/{n}"
    opened = {os.path.basename(f) for f in zm.read_pruned(box).inputFiles()}
    assert opened == set(names)


def test_empty_selection_is_schemaed_and_empty(spark, indexed):
    li, _, zm, _ = indexed
    mx = li.agg(F.max(COLS[0])).collect()[0][0]
    box = {COLS[0]: (mx + 10_000, mx + 20_000)}
    out = zm.read_pruned(box)
    assert out.count() == 0
    assert set(COLS) <= set(out.columns)


def test_refresh_indexes_only_new_files(spark, indexed, tmp_path):
    """Append two files to the table dir: refresh() indexes exactly
    those two, leaves the prior state rows byte-identical, and the
    pruned scan sees the appended rows."""
    li, table, _, n = indexed
    # separate state so the module-scoped fixture stays pristine
    zm = ZoneMapIndex(spark, str(tmp_path / "state"), table, COLS)
    assert zm.build() == n
    before = {r["file"]: tuple(r) for r in zm.read_state().collect()}

    extra = li.limit(500).repartition(2)
    extra.write.mode("append").parquet(table)
    try:
        added = zm.refresh()
        assert added == 2
        after = {r["file"]: tuple(r) for r in zm.read_state().collect()}
        assert len(after) == n + 2
        for f, row in before.items():
            assert after[f] == row, "existing state rows must not change"
        # idempotence: nothing new → nothing indexed
        assert zm.refresh() == 0
        box = _box(li, frac=1.0)  # whole range: every row visible
        assert zm.read_pruned(box).count() == spark.read.parquet(
            table
        ).count()
    finally:
        # restore the shared table dir for other tests in this module
        state = {r["file"] for r in zm.read_state().collect()}
        for name in sorted(os.listdir(table)):
            if name.endswith(".parquet") and name not in before:
                os.remove(os.path.join(table, name))


def test_unknown_column_fails_loudly(spark, indexed):
    _, _, zm, _ = indexed
    with pytest.raises(ValueError, match="not indexed"):
        zm.select_files({"l_quantity": (0, 10)})


def test_non_integer_column_fails_loudly(spark, tmp_path):
    df = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    table = str(tmp_path / "t")
    df.write.parquet(table)
    zm = ZoneMapIndex(
        spark, str(tmp_path / "state"), table, ["o_orderpriority"]
    )
    with pytest.raises(ValueError, match="integer"):
        zm.build()


def test_sync_reconciles_after_compaction(spark, tmp_path):
    """sinks.compact rewrites the file layout entirely; refresh()
    alone would keep stale rows pointing at deleted files. sync()
    drops them, indexes the new files, and the pruned scan stays
    exactly equal to the full filter."""
    from datafusion_delta_queries_spark.sources.sinks import compact

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", *COLS, "l_quantity"
    )
    table = str(tmp_path / "t")
    li.repartition(16).write.parquet(table)  # deliberately small files
    zm = ZoneMapIndex(spark, str(tmp_path / "state"), table, COLS)
    n0 = zm.build()
    assert n0 == 16

    # in-place compaction: rewrite to a sibling, swap the directory
    import os
    import shutil

    staged = str(tmp_path / "t_new")
    compact(spark, table, staged, target_file_bytes=10**9)
    shutil.rmtree(table)
    os.rename(staged, table)

    added, dropped = zm.sync()
    assert dropped == 16 and added >= 1
    state_files = {r["file"] for r in zm.read_state().collect()}
    assert state_files == set(zm._data_files())

    box = _box(li, frac=0.3)
    pred = " AND ".join(
        f"{c} BETWEEN {lo} AND {hi}" for c, (lo, hi) in box.items()
    )
    got = sorted(map(tuple, zm.read_pruned(box).collect()))
    want = sorted(map(tuple, spark.read.parquet(table).where(pred).collect()))
    assert got == want and got
    # idempotent once reconciled
    assert zm.sync() == (0, 0)
