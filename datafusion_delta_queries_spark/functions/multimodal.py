"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub — but every piece of Spark plumbing
around it is real and tested: BinaryType payload column, metadata
struct, Arrow-batched ``mapInPandas`` with an explicit output schema,
and per-batch vectorized feature extraction (hashlib over bytes).

At scale: mapInPandas streams Arrow batches executor-side; payload
columns should be stored in their own parquet column chunk (automatic)
so metadata-only queries never read the bytes. Feature extraction is
embarrassingly parallel — partition count, not data motion, bounds it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("decoded", T.StringType()),
    ]
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    The fixtures have no real media, so the payload is the UTF-8 text
    bytes — the schema shape (binary + struct metadata) is what a real
    image/audio column would use.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, kind: str) -> str:
    """STUB: real decoders (PIL/ffmpeg/...) are not in this container.

    Deterministic fake so tests and oracles are stable. A production
    build replaces this body with the actual decode + feature model.
    """
    return f"stub:{kind}"


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "content_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "decoded": [
                        _decode_stub(bytes(p), m["kind"])
                        for p, m in zip(pdf["payload"], pdf["meta"])
                    ],
                }
            )

    return payloads.mapInPandas(run, FEATURE_SCHEMA)
