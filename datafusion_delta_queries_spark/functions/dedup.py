"""Deduplication primitives: exact hash, MinHash+LSH bands, SimHash.

Engine-neutral hashing: every hash is (salted) md5 over strings —
identical hex output in Spark and DuckDB, so each operator has an exact
SQL oracle. MinHash uses the *lexicographic min of salted md5 hex*
trick: min over VARCHAR of fixed-length hex is a perfectly good random
permutation minimum, and both engines order ASCII hex identically.

Scale posture (100 TB): signatures are per-row higher-order array
expressions (no shuffle); candidate generation joins on (band, hash)
buckets — the classic sub-quadratic LSH join. Bucket skew (a hot band
hash) is handled by AQE skew-join; the exact-verify join touches only
candidate pairs.
"""

from __future__ import annotations


def minhash_signature(shingles_col: str, k: int = 12) -> str:
    """k-component MinHash signature: sig[h] = min(md5(h || ':' || s)).

    DuckDB twin: list_transform(generate_series(0, k-1),
    h -> list_aggregate(list_transform(sh, s -> md5(h || ':' || s)), 'min')).
    """
    return (
        f"transform(sequence(0, {k - 1}), "
        f"h -> array_min(transform({shingles_col}, "
        f"s -> md5(concat(cast(h AS string), ':', s)))))"
    )


def lsh_bands(sig_col: str, bands: int = 6, rows: int = 2, k: int = 12) -> str:
    """Band keys 'b:md5(sig[b*r+1] | ... )' — equal keys = candidate pair.

    DuckDB twin: list_transform(generate_series(0, bands-1),
    b -> b || ':' || md5(sig[b*r+1] || '|' || sig[b*r+2] ...)).

    ``k`` is the signature length the bands index into. Spark's
    ``element_at`` returns NULL past the end of the array, so a
    bands*rows > k mismatch would silently NULL every band key and
    drop all candidate pairs — fail loudly at build time instead.
    """
    if bands * rows > k:
        raise ValueError(
            f"bands*rows = {bands * rows} exceeds signature length k={k}; "
            "element_at past the signature end would NULL all band keys"
        )
    joined = " , '|', ".join(
        f"element_at({sig_col}, b * {rows} + {r})" for r in range(1, rows + 1)
    )
    return (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> concat(cast(b AS string), ':', md5(concat({joined}))))"
    )


def jaccard(a_col: str, b_col: str) -> str:
    """Exact set Jaccard of two distinct-element array columns.

    DuckDB twin: len(list_intersect(a,b)) / (len(a)+len(b)-len(..)).
    """
    inter = f"size(array_intersect({a_col}, {b_col}))"
    return (
        f"CAST({inter} AS DOUBLE) / "
        f"(size({a_col}) + size({b_col}) - {inter})"
    )


# SimHash: 128-bit fingerprint from md5 nibbles of member tokens.
# Per (doc, hex-position p in 1..32, bit b in 0..3): each token votes
# ±1 with bit b of nibble p of md5(token); the fingerprint bit is 1 iff
# the vote sum is positive. Emitted as 32 hex chars. Exactly
# replicable in DuckDB (same md5; instr here == strpos there).
NIBBLE_DECODE = "instr('0123456789abcdef', substring(md5({tok}), p, 1)) - 1"


def simhash_vote_exprs() -> list[str]:
    """Per-(token, position) vote columns v0..v3 (±1 per bit)."""
    nib = NIBBLE_DECODE.format(tok="tok")
    return [
        f"CAST(2 * ((CAST(({nib}) AS INT) div {1 << b}) % 2) - 1 AS INT) AS v{b}"
        for b in range(4)
    ]


def simhash_nibble_expr() -> str:
    """Rebuild a hex char from the 4 per-bit vote sums s0..s3."""
    val = " + ".join(f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(4))
    return f"substring('0123456789abcdef', ({val}) + 1, 1)"
