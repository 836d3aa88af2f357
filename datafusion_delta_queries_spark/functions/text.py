"""Text normalization / tokenization / shingling expression builders.

All builders return SQL expression strings (compose with selectExpr).
Conventions shared with the DuckDB oracles:

- normalize: lower-case, collapse whitespace runs to single spaces, trim;
- words: split normalized text on single space;
- word shingles: distinct n-word grams joined by one space;
- char shingles: distinct n-char rolling windows of normalized text.

Engine-portability notes (each op has an exact DuckDB twin):
Spark arrays are addressed via 1-based ``element_at``; DuckDB lists are
1-based natively. Spark ``sequence(a, b)`` errors when b < a, so every
shingle builder guards short inputs with CASE.
"""

from __future__ import annotations

# BPE-ish token pattern over normalized text (whitespace already
# collapsed to single spaces): letter runs, digit runs, single other.
BPE_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def round_portable(expr: str, digits: int) -> str:
    """Engine-portable half-up rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    ``round(double, n)`` is NOT portable: Spark rounds the decimal
    expansion via BigDecimal while DuckDB rounds x·10ⁿ with std::round,
    and knife-edge values (e.g. 0.70875 at 4 digits) come out one ulp
    apart. This formula is the same IEEE op sequence in both engines,
    so equal input doubles give bit-equal results. (The string is valid
    in both SQL dialects — use it verbatim in oracles.)
    """
    scale = f"1e{digits}"
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS DOUBLE) / {scale}"


def norm_text(col: str) -> str:
    r"""lower + collapse \s+ + trim. DuckDB: trim(regexp_replace(lower(c), '\s+', ' ', 'g'))."""
    return f"trim(regexp_replace(lower({col}), '\\\\s+', ' '))"


def words(norm_col: str) -> str:
    """Split normalized text on single spaces."""
    return f"split({norm_col}, ' ')"


def word_shingles(words_col: str, n: int = 3) -> str:
    """Distinct n-word shingles. DuckDB twin:
    list_distinct(list_transform(generate_series(1, len(w)-(n-1)),
    i -> w[i] || ' ' || ... )).
    """
    parts = ", ' ', ".join(
        f"element_at({words_col}, i + {k})" for k in range(1, n + 1)
    )
    return (
        f"CASE WHEN size({words_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({words_col}) - {n}), "
        f"i -> concat({parts}))) ELSE array() END"
    )


def char_shingles(norm_col: str, n: int = 8) -> str:
    """Distinct n-char rolling windows (rolling-hash fingerprint input)."""
    return (
        f"CASE WHEN length({norm_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, length({norm_col}) - {n - 1}), "
        f"i -> substring({norm_col}, i, {n}))) ELSE array() END"
    )


def bpe_tokens(norm_col: str) -> str:
    """BPE-ish tokenization: regexp_extract_all with BPE_TOKEN_PATTERN."""
    return f"regexp_extract_all({norm_col}, '{BPE_TOKEN_PATTERN}', 0)"


# -- stored text-index bucketing ------------------------------------------

# Fixture bucket count for the stored inverted/phrase indexes. At
# corpus scale the count is a BUILD parameter derived from corpus size
# (posting volume / target partition bytes), exactly like the LSH
# band/bucket parameters — 16 caps build/search parallelism and write
# fan-out on a real corpus. Search must pass the SAME count the build
# used (the bucket id is part of the index layout, like a hash ring).
TEXT_INDEX_BUCKETS = 16


def _check_bucket_count(n_buckets: int) -> None:
    if not 1 <= n_buckets <= 256:
        # two hex chars (8 bits) feed the mod; a wider index needs a
        # wider slice — refuse loudly instead of silently skewing
        raise ValueError(
            f"token bucket count must be in [1, 256], got {n_buckets} "
            "(widen the md5 slice for more)"
        )


def token_bucket(col: str = "token", n_buckets: int = TEXT_INDEX_BUCKETS) -> str:
    """Spark SQL expr: md5-derived index bucket of ``col`` in
    [0, n_buckets). Byte-equal to ``token_bucket_id`` and the DuckDB
    twin ``token_bucket_oracle`` for the same count."""
    _check_bucket_count(n_buckets)
    return (
        f"CAST(conv(substring(md5({col}), 1, 2), 16, 10) "
        f"% {n_buckets} AS INT)"
    )


def token_bucket_id(token: str, n_buckets: int = TEXT_INDEX_BUCKETS) -> int:
    """Driver-side twin of ``token_bucket``: the bucket a query term's
    posting list lives in — computed from the term alone, no scan."""
    import hashlib

    _check_bucket_count(n_buckets)
    return int(hashlib.md5(token.encode()).hexdigest()[:2], 16) % n_buckets


def token_bucket_oracle(
    col: str = "token", n_buckets: int = TEXT_INDEX_BUCKETS
) -> str:
    """DuckDB twin of ``token_bucket`` (no hex cast there: strpos
    decode of the first two hex chars)."""
    _check_bucket_count(n_buckets)
    return (
        f"((strpos('0123456789abcdef', substring(md5({col}), 1, 1)) - 1)"
        f" * 16 + strpos('0123456789abcdef', substring(md5({col}), 2, 1))"
        f" - 1) % {n_buckets}"
    )
