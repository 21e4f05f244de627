"""Deterministic cross-engine hashing kernels.

The dedup/similarity operators need hashes that are (a) computed JVM-side
in Spark (no Python in the hot path) and (b) reproducible in ANSI-ish SQL
so the DuckDB oracle can hash-match MinHash/SimHash signatures exactly.
Built-in engine hashes differ (Spark xxhash64 vs DuckDB hash), so the
per-word hash is MD5-based: int(first 15 hex chars of md5) mod P. MD5 is
bit-identical across engines, stays inside whole-stage codegen in Spark
(conv/substring/md5 are all codegen expressions — a per-character
fold via higher-order functions was ~100x slower, interpreted), and
DuckDB casts '0x'||hex to BIGINT natively. Shingle combination and the
MinHash affine family (a*h+b mod p) are plain integer arithmetic.

All arithmetic stays < 2^63: word hashes are reduced mod P (~2^20) so
products with small multipliers are overflow-safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_003          # prime modulus for token hashes
FP_P = 2_147_483_647   # prime modulus for rolling document fingerprints

# (a, b) pairs for the MinHash affine family h_i(x) = (a*x + b) mod P.
MINHASH_COEFFS = [(2 * i + 3, 5 * i + 7) for i in range(8)]


# ---------------------------------------------------------------------------
# Spark (Column) implementations — higher-order functions, JVM-side
# ---------------------------------------------------------------------------
def char_hash(s: Column) -> Column:
    """Deterministic cross-engine string hash: first 60 bits of md5, mod P."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % P


def word_hashes(words: Column) -> Column:
    """array<string> → array<long> of per-word md5 hashes (mod P)."""
    return F.transform(words, char_hash)


def shingle_hashes(wh: Column, n: int = 3) -> Column:
    """Combine consecutive word hashes into n-gram shingle hashes.

    wh: array<long> word hashes. Uses 1-based element_at (same indexing as
    the DuckDB oracle's list_extract). Returns array<long> (may be empty
    for docs shorter than n words); caller dedups with array_distinct.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(wh) - F.lit(n - 1), F.lit(0)))
    combined = F.transform(
        idx,
        lambda i: sum(
            (F.element_at(wh, (i + k).cast("int")) * F.lit(31 ** (n - 1 - k)))
            for k in range(n)
        )
        % F.lit(P),
    )
    return F.when(F.size(wh) >= n, combined).otherwise(
        F.expr("cast(array() as array<bigint>)")
    )


def minhash_signature(shingles: Column) -> Column:
    """array<long> shingle hashes → array<long> MinHash signature (k=8).

    Empty shingle sets map to the sentinel P (larger than any hash), so
    empty docs never collide with real content.
    """
    sigs = [
        F.coalesce(
            F.array_min(F.transform(shingles, lambda x: (x * a + b) % P)), F.lit(P)
        )
        for (a, b) in MINHASH_COEFFS
    ]
    return F.array(*sigs)


def rolling_fingerprint(wh: Column) -> Column:
    """Order-sensitive document fingerprint: fold((acc*33 + h) % FP_P)."""
    return F.aggregate(
        wh, F.lit(0).cast("long"), lambda acc, h: (acc * 33 + h) % FP_P
    )


# ---------------------------------------------------------------------------
# DuckDB SQL builders — same constants, same arithmetic, same indexing
# ---------------------------------------------------------------------------
def sql_char_hash(expr: str) -> str:
    """DuckDB SQL for char_hash(expr)."""
    return f"(CAST('0x' || SUBSTR(MD5({expr}), 1, 15) AS BIGINT) % {P})"


def sql_word_hashes(words_expr: str) -> str:
    return f"LIST_TRANSFORM({words_expr}, w -> {sql_char_hash('w')})"


def sql_shingle_hashes(wh_expr: str, n: int = 3) -> str:
    # alias must not collide with any caller column name (DuckDB binds the
    # bare name in the derived table's SELECT to itself otherwise)
    terms = " + ".join(
        f"LIST_EXTRACT(__wh, i + {k}) * {31 ** (n - 1 - k)}" for k in range(n)
    )
    return (
        f"(SELECT CASE WHEN LEN(__wh) >= {n} THEN "
        f"LIST_TRANSFORM(GENERATE_SERIES(1, LEN(__wh) - {n - 1}), "
        f"i -> ({terms}) % {P}) "
        f"ELSE [] END FROM (SELECT {wh_expr} AS __wh) __sht)"
    )


def sql_minhash_signature(shingles_expr: str) -> str:
    sigs = ", ".join(
        f"COALESCE(LIST_MIN(LIST_TRANSFORM(__sh, x -> (x * {a} + {b}) % {P})), {P})"
        for (a, b) in MINHASH_COEFFS
    )
    return f"(SELECT [{sigs}] FROM (SELECT {shingles_expr} AS __sh) __sigt)"


def sql_rolling_fingerprint(wh_expr: str) -> str:
    return (
        f"LIST_REDUCE(LIST_CONCAT([CAST(0 AS BIGINT)], {wh_expr}), "
        f"(acc, h) -> (acc * 33 + h) % {FP_P})"
    )
