"""Bloom-filter file-skipping index: point-lookup pruning measured
(a unique key opens ~1 file where the zone map can prune nothing),
incremental refresh/sync proven file-minimal, and correctness never
depending on the filter (residual equality makes false positives
harmless; no false negatives by construction)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.sources.bloom import BloomFileIndex

from .conftest import SF_SMALL

KEY = "o_orderkey"


def _write_date_clustered(orders, table: str, n_files: int = 8) -> None:
    # Cluster files by DATE so the lookup key (o_orderkey) is
    # scattered: every file's [min, max] orderkey range spans nearly
    # the whole domain — the zone map's worst case, the Bloom
    # filter's home turf.
    (
        orders.repartitionByRange(n_files, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("errorifexists")
        .parquet(table)
    )


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bloom")
    orders = load_table(spark, SF_SMALL, "orders").select(
        KEY, "o_custkey", "o_orderdate", "o_totalprice"
    )
    table = str(root / "table")
    _write_date_clustered(orders, table)
    bf = BloomFileIndex(spark, str(root / "state"), table, KEY)
    n = bf.build()
    return orders, table, bf, n


def _some_keys(orders, n=5):
    return [
        r[KEY]
        for r in orders.select(KEY).orderBy(KEY).limit(500).collect()
    ][::100][:n]


def test_lookup_equals_full_filter(spark, indexed):
    orders, table, bf, _ = indexed
    for key in _some_keys(orders):
        got = sorted(map(tuple, bf.read_pruned(key).collect()))
        want = sorted(
            map(tuple, spark.read.parquet(table).where(
                F.col(KEY) == key
            ).collect())
        )
        assert got == want and len(want) >= 1


def test_point_lookup_opens_few_files(spark, indexed):
    orders, table, bf, n_files = indexed
    assert n_files == 8
    # A unique key lives in exactly 1 file; with m=2^17 over ~6k-row
    # files the false-positive rate is far below 1 file in 8, so the
    # candidate set must be strictly smaller than the table — and
    # almost always exactly 1.
    sizes = [len(bf.select_files(k)) for k in _some_keys(orders)]
    assert all(1 <= s < n_files for s in sizes)
    assert sum(sizes) <= len(sizes) + 2  # ~1 file each, rare fp slack


def test_absent_key_prunes_everything(spark, indexed):
    orders, table, bf, _ = indexed
    mx = orders.agg(F.max(KEY)).collect()[0][0]
    absent = mx + 999_983  # prime offset, certainly absent
    files = bf.select_files(absent)
    assert len(files) <= 1  # 0 expected; 1 tolerated as fp slack
    assert bf.read_pruned(absent).count() == 0


def test_refresh_indexes_only_new_files(spark, indexed, tmp_path):
    orders, table, bf, n_files = indexed
    assert bf.refresh() == 0  # nothing new — no rows appended
    before = bf.read_state().count()
    original = set(os.listdir(table))
    extra = orders.limit(50).withColumn(
        KEY, F.col(KEY) + F.lit(10_000_000)
    )
    extra.coalesce(1).write.mode("append").parquet(table)
    try:
        assert bf.refresh() == 1
        assert bf.read_state().count() > before
        key = extra.agg(F.min(KEY)).collect()[0][0]
        assert len(bf.select_files(key)) >= 1
        assert bf.read_pruned(key).count() == 1
    finally:
        # restore the module-scoped fixture's table for later tests
        for n in set(os.listdir(table)) - original:
            os.remove(os.path.join(table, n))
        bf.sync()


def test_sync_drops_stale_and_adds_new(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders").select(
        KEY, "o_custkey", "o_orderdate", "o_totalprice"
    )
    table = str(tmp_path / "table")
    _write_date_clustered(orders, table, n_files=4)
    bf = BloomFileIndex(spark, str(tmp_path / "state"), table, KEY)
    bf.build()
    names = sorted(
        n for n in os.listdir(table) if n.endswith(".parquet")
    )
    os.remove(os.path.join(table, names[0]))
    added, dropped = bf.sync()
    assert (added, dropped) == (0, 1)
    state_files = {
        r["file"] for r in bf.read_state().select("file").collect()
    }
    assert names[0] not in state_files
    # a pruned read must not try to open the removed file
    for key in [
        r[KEY] for r in spark.read.parquet(table).limit(3).collect()
    ]:
        got = bf.read_pruned(key).count()
        want = spark.read.parquet(table).where(
            F.col(KEY) == key
        ).count()
        assert got == want


def test_bad_params_fail_loudly(spark, tmp_path):
    with pytest.raises(ValueError):
        BloomFileIndex(spark, "s", "t", KEY, m_bits=1000)
    with pytest.raises(ValueError):
        BloomFileIndex(spark, "s", "t", KEY, k=0)
    bf = BloomFileIndex(spark, str(tmp_path / "s"), str(tmp_path / "t"), KEY)
    with pytest.raises(Exception):
        bf.build()  # no files


def test_meta_sidecar_survives_stale_sync(spark, tmp_path):
    """The probe-geometry sidecar lives OUTSIDE the state dir, so the
    stale-path mode('overwrite') rewrite can never wipe it — a crash
    mid-sync leaves the geometry intact. Also covers the legacy
    inside-the-dir sidecar migration."""
    import json

    orders = load_table(spark, SF_SMALL, "orders").select(
        KEY, "o_custkey", "o_orderdate", "o_totalprice"
    )
    table = str(tmp_path / "table")
    _write_date_clustered(orders, table, n_files=4)
    state = str(tmp_path / "state")
    bf = BloomFileIndex(spark, state, table, KEY)
    bf.build()
    sidecar = state.rstrip("/") + ".meta.json"
    assert os.path.exists(sidecar), "sidecar must be a SIBLING file"
    geo = json.load(open(sidecar))

    # stale-path sync (drop a file) — simulate the crash window by
    # checking the sidecar exists DURING the state dir's lifetime and
    # is never inside the overwritten directory
    names = sorted(n for n in os.listdir(table) if n.endswith(".parquet"))
    os.remove(os.path.join(table, names[0]))
    bf.sync()
    assert json.load(open(sidecar)) == geo
    # reopened handle probes with the same geometry
    bf2 = BloomFileIndex(spark, state, table, KEY)
    assert (bf2.m_bits, bf2.k) == (bf.m_bits, bf.k)

    # legacy layout: meta inside the dir only → still loads, and the
    # first save migrates it to the sibling
    os.remove(sidecar)
    legacy = os.path.join(state, "_bloom_meta.json")
    with open(legacy, "w") as f:
        json.dump(geo, f)
    bf3 = BloomFileIndex(spark, state, table, KEY)
    assert (bf3.m_bits, bf3.k) == (bf.m_bits, bf.k)
