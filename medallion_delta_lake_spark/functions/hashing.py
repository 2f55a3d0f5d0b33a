"""Portable deterministic hashing — identical in Spark and ANSI SQL.

The near-dup dedup family (MinHash/LSH, SimHash, fingerprinting —
SURVEY.md §2.11 extension surface) needs a hash function that the
DuckDB oracle can reproduce bit-for-bit. Spark's ``hash``/``xxhash64``
and DuckDB's ``hash`` are different algorithms, so we build a shared
one from ``md5`` (available and byte-identical in both engines):

    h64(s) = int(hex(md5(s))[0:15], 16)   ∈ [0, 2^60)

15 hex chars = 60 bits < 2^63, so the value is an exact BIGINT in both
engines (parity verified across ASCII/Unicode/empty inputs). All
downstream mixing (universal-hash permutations for MinHash, polynomial
rolling fingerprints) is pure 64-bit integer arithmetic kept below
2^63 by reducing mod P first, hence engine-exact.

This is JVM-side expression code (md5 + conv + arithmetic) — no Python
UDF — so a 100 TB dedup sweep stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Universal-hash modulus: largest prime < 2^30. a*h+b with a,b,h < P
# stays < 2^60 — no bigint overflow in either engine.
P_HASH = 1_073_741_789

# Rolling-fingerprint modulus (prime < 10^12): s*B + x ≤ ~10^18 < 2^63,
# so the fold never overflows BIGINT in either engine.
P_ROLL = 999_999_999_989
B_ROLL = 1_000_003


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def h64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (BIGINT, ≥ 0)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def h64_sql(expr: str) -> str:
    """DuckDB twin of :func:`h64` (exact same values)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    h_i(x) = (a_i * x + b_i) mod P_HASH. Knuth-style multiplicative
    constants; a_i forced odd/nonzero."""
    out = []
    for i in range(num_perm):
        a = (2_654_435_761 * (i + 1) + 1) % P_HASH
        b = (40_503 * (i + 1) * 65_537 + 12_345) % P_HASH
        out.append((a or 1, b))
    return out


def perm_hash(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation of a (already ≥0) bigint hash."""
    return (F.lit(a) * (h % F.lit(P_HASH)) + F.lit(b)) % F.lit(P_HASH)


def perm_hash_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({a} * (({h_expr}) % {P_HASH}) + {b}) % {P_HASH})"


def rolling_fingerprint(tokens: Column | str) -> Column:
    """Polynomial rolling hash over a token array (document
    fingerprint): fp = fold(tokens, 0, (s, t) -> (s*B + h64(t) mod P)
    mod P). Order-sensitive (unlike a set hash) — two documents with
    the same words in different order fingerprint differently.
    Engine-exact: every intermediate stays < 2^63."""
    return F.aggregate(
        F.transform(_c(tokens), lambda t: h64(t) % F.lit(P_ROLL)),
        F.lit(0).cast("bigint"),
        lambda s, x: (s * F.lit(B_ROLL) + x) % F.lit(P_ROLL),
    )


def rolling_fingerprint_sql(tokens_expr: str) -> str:
    """DuckDB twin of :func:`rolling_fingerprint`."""
    th = f"list_transform({tokens_expr}, t -> {h64_sql('t')} % {P_ROLL})"
    return (
        f"coalesce(list_reduce(list_prepend(CAST(0 AS BIGINT), {th}),"
        f" (s, x) -> (s * {B_ROLL} + x) % {P_ROLL}), 0)"
    )
