"""Source-format breadth: CSV / JSON / ORC round-trip consistency.

The reference reads only in-memory tables in its tests (SURVEY §2.2);
a Spark engine gets every format from the DataSource API. The gate:
writing a table out in each format and reading it back yields exactly
the parquet-read rows — i.e. format choice never changes query
results. (CSV needs explicit schema + timestamp format; that plumbing
is what this test pins.)
"""

from __future__ import annotations

from datafusion_delta_queries_spark.catalog import load_table

from .conftest import SF_SMALL


def _same_rows(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_binary_file_source_feeds_multimodal_pipeline(spark, tmp_path):
    """Raw-asset ingestion: ``binaryFile`` reads opaque blobs (the way
    a real image/audio corpus lands) and the bytes flow into the same
    multimodal feature extractor the parquet-backed queries use."""
    from pyspark.sql import functions as F

    from datafusion_delta_queries_spark.functions.multimodal import (
        extract_features,
    )

    blobs = {f"doc_{i}.bin": bytes([i] * (10 + i)) for i in range(5)}
    for fname, payload in blobs.items():
        (tmp_path / fname).write_bytes(payload)

    df = (
        spark.read.format("binaryFile")
        .load(str(tmp_path) + "/*.bin")
        .select(
            F.element_at(F.split("path", "/"), -1).alias("name"),
            F.col("length"),
            F.col("content"),
        )
    )
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == set(blobs)
    for fname, payload in blobs.items():
        assert bytes(rows[fname]["content"]) == payload
        assert rows[fname]["length"] == len(payload)

    feats = extract_features(
        df.select(
            F.regexp_extract("name", r"doc_(\d+)", 1).cast("long").alias("doc_id"),
            F.col("content").alias("payload"),
            F.struct(F.lit("blob").alias("kind")).alias("meta"),
        )
    ).collect()
    assert len(feats) == len(blobs)
    for r in feats:
        assert r["n_bytes"] == len(blobs[f"doc_{r['doc_id']}.bin"])


def test_text_source_feeds_document_pipeline(spark, tmp_path):
    """Line-oriented ``text`` source (raw corpus dumps) produces rows
    the text operators consume directly."""
    from pyspark.sql import functions as F

    lines = ["the quick brown fox", "jumps over the lazy dog", "  ", "fin"]
    (tmp_path / "corpus.txt").write_text("\n".join(lines))
    df = spark.read.text(str(tmp_path / "corpus.txt"))
    got = [r["value"] for r in df.collect()]
    assert got == lines
    counted = df.where(F.length(F.trim("value")) > 0).select(
        F.size(F.split(F.trim("value"), r"\s+")).alias("n_words")
    )
    assert sorted(r["n_words"] for r in counted.collect()) == [1, 4, 5]


def test_csv_json_orc_round_trip(spark, tmp_path):
    base = load_table(spark, SF_SMALL, "orders")

    p_csv = str(tmp_path / "orders_csv")
    base.write.mode("overwrite").option("header", True).csv(p_csv)
    got_csv = spark.read.schema(base.schema).option("header", True).csv(p_csv)
    assert _same_rows(base, got_csv)

    p_json = str(tmp_path / "orders_json")
    base.write.mode("overwrite").json(p_json)
    got_json = spark.read.schema(base.schema).json(p_json)
    assert _same_rows(base, got_json)

    p_orc = str(tmp_path / "orders_orc")
    base.write.mode("overwrite").orc(p_orc)
    got_orc = spark.read.orc(p_orc)
    assert _same_rows(base, got_orc)


def test_perceptual_hash_null_payload_is_zero_hash(spark):
    """NULL payloads (a documents row whose text is NULL encodes to a
    NULL binary) must zero-hash like empties, not crash the worker
    with bytes(None)."""
    from datafusion_delta_queries_spark.functions import multimodal

    payloads = spark.createDataFrame(
        [(1, None), (2, b""), (3, b"abc")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in multimodal.perceptual_hash(payloads).collect()}
    assert rows[1].h0 == 0 and rows[1].h1 == 0
    assert rows[1].b0 == rows[2].b0 == 0  # NULL and empty are identical
    assert rows[3].h0 != 0 or rows[3].h1 != 0


def test_perceptual_hash_empty_payload_is_zero_hash(spark):
    """Empty payloads must hash (to the zero hash — identical empties
    ARE duplicates), not crash the mapInPandas worker with a
    modulo-by-zero."""
    from datafusion_delta_queries_spark.functions import multimodal

    payloads = spark.createDataFrame(
        [(1, b""), (2, b""), (3, b"abc")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in multimodal.perceptual_hash(payloads).collect()}
    assert rows[1].h0 == 0 and rows[1].h1 == 0
    assert rows[1].b0 == rows[2].b0 == 0
    assert rows[3].h0 != 0 or rows[3].h1 != 0
