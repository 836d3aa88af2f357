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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ts", T.DoubleType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

# Synthetic media model for the stubbed decoder: 100 payload bytes =
# 1 second of "video"; one frame sampled every 2 seconds.
_BYTES_PER_SECOND = 100
_FRAME_EVERY_S = 2.0


def sample_frames(payloads: DataFrame) -> DataFrame:
    """Video-style frame sampling: one input row → N frame rows.

    The decode step is stubbed (no codecs in the container): duration
    is derived from payload size and each "frame" is a deterministic
    hash of (payload, frame index) — but the Spark-side shape is the
    real thing: a 1→N row expansion through Arrow-batched mapInPandas
    with an explicit output schema, which is exactly how a real
    ffmpeg-backed sampler plugs in (replace the body, keep the plan).

    At scale: expansion happens executor-side per Arrow batch — no
    shuffle, no driver involvement; output partitioning follows input.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            ts: list[float] = []
            md5s: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = int(len(raw) // (_BYTES_PER_SECOND * _FRAME_EVERY_S)) + 1
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    ts.append(i * _FRAME_EVERY_S)
                    md5s.append(
                        hashlib.md5(raw + b"#" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ts": ts, "frame_md5": md5s}
            )

    return payloads.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.IntegerType()),
        T.StructField("b1", T.IntegerType()),
        T.StructField("b2", T.IntegerType()),
        T.StructField("b3", T.IntegerType()),
        T.StructField("h0", T.LongType()),
        T.StructField("h1", T.LongType()),
    ]
)


def perceptual_hash(
    payloads: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """64-bit average-hash (aHash) per payload — the perceptual
    fingerprint an image-dedup pipeline computes after decode.

    Decode is stubbed (no codecs in this container): the "8×8
    grayscale grid" samples payload byte ``i % n`` for i ∈ [0, 64)
    (the first 64 bytes, wrapped for short payloads) instead of real
    pixels; bit i = 1 iff its sample exceeds the grid mean. The
    sampling is deliberately position-stable so near-identical
    payloads (suffix edits) land within a few bits — the property a
    real aHash has under resize/re-encode — and the whole pipeline
    downstream of decode (Arrow-batched hashing, band split,
    Hamming verify) is the production shape: swap the grid for real
    pixels and nothing else changes.

    Emits 4×16-bit band keys (b0..b3, the LSH blocking keys) and the
    two 32-bit halves (h0/h1) whose XOR popcounts give the exact
    Hamming distance JVM-side. ``carry`` names extra input columns
    copied through unchanged (the signed maintainers ride the ``_w``
    weight through the hash pass so the change batch is hashed once,
    not once per sign).
    """
    schema = T.StructType(
        PHASH_SCHEMA.fields
        + [payloads.schema[c] for c in carry]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def pack(bits: list[int]) -> int:
            x = 0
            for b in bits:
                x = (x << 1) | b
            return x

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "b0", "b1", "b2", "b3", "h0", "h1")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL and empty payloads hash to the zero hash (all
                # bits 0): two content-free documents ARE identical,
                # bytes(None) would raise, and the modulo sampling
                # below would otherwise divide by zero.
                raw = b"" if payload is None else bytes(payload)
                n = len(raw)
                g = [raw[i % n] for i in range(64)] if n else [0] * 64
                # mean = sum/64: /2^6 is exact in binary floating
                # point, so the strict > below is engine-portable.
                mean = sum(g) / 64.0
                bits = [1 if v > mean else 0 for v in g]
                out["doc_id"].append(doc_id)
                for k in range(4):
                    out[f"b{k}"].append(pack(bits[16 * k:16 * k + 16]))
                out["h0"].append(pack(bits[:32]))
                out["h1"].append(pack(bits[32:]))
            frame = pd.DataFrame(out)
            for c in carry:
                frame[c] = list(pdf[c])
            yield frame

    return payloads.select("doc_id", "payload", *carry).mapInPandas(
        run, schema
    )


def phash_near_dup(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded near-duplicate pairs over perceptual hashes.

    Pigeonhole blocking: 4 disjoint 16-bit bands — any pair within
    Hamming ≤ 3 differs in at most 3 bands, so it MUST agree on at
    least one band and the banded equi-join is a COMPLETE candidate
    generator (no cartesian, no recall loss) for the default
    threshold. Candidates verify exactly via two 32-bit XOR
    popcounts. At 100 TB the band join is the standard LSH shuffle on
    (band_idx, band_val); production adds the same [2, cap]
    bucket-population gate the MinHash index uses to bound hot
    buckets.
    """
    if max_hamming >= 4:
        raise ValueError(
            "4-band pigeonhole blocking is only complete for "
            f"max_hamming <= 3; got {max_hamming}"
        )
    bands = hashes.select(
        "doc_id",
        "h0",
        "h1",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_idx", "band_val"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.h0").alias("a_h0"),
            F.col("a.h1").alias("a_h1"),
            F.col("b.h0").alias("b_h0"),
            F.col("b.h1").alias("b_h1"),
        )
        .distinct()  # a close pair may agree on several bands
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr(
            "CAST(bit_count(a_h0 ^ b_h0) + bit_count(a_h1 ^ b_h1) "
            "AS BIGINT)"
        ).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("thumb_bytes", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_stub(payloads: DataFrame, max_bytes: int = 64) -> DataFrame:
    """Thumbnail/resize stub: cap each payload at ``max_bytes``.

    A real implementation decodes + downsamples; the stub truncates —
    same signature, same batch shape, same schema contract.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = [bytes(p) for p in pdf["payload"]]
            thumbs = [r[:max_bytes] for r in raws]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(r) for r in raws],
                    "thumb_bytes": [len(t) for t in thumbs],
                    "thumb_md5": [hashlib.md5(t).hexdigest() for t in thumbs],
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)
