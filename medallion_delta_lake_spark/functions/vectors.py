"""Vector math over array<float|double> columns as native expressions.

Used by the similarity-search and embedding-near-dup operators
(SURVEY.md §2.11 extension surface). Everything here is a Catalyst
higher-order-function expression — JVM-side, no Python UDF, so the hot
path of a 100 TB ANN sweep never crosses the Arrow boundary.

``dot_product(..., exact=True)`` accumulates in DECIMAL(30,12) instead
of double. Decimal addition is associative, so the result is identical
regardless of evaluation order/engine — we use it for oracle-checked
queries where a float sum's last-bit wobble would break value-hash
comparison. Precision 30 (not 38) is deliberate: Spark types
DECIMAL(p,s)+DECIMAL(p,s) as DECIMAL(p+1,s), and at p=38 the +1
overflows the cap, forcing a scale reduction that both breaks the
higher-order-function type check (accumulator DECIMAL(38,12) vs merge
result DECIMAL(38,11)) and makes per-step rounding order-dependent.
At p=30 the sum is DECIMAL(31,12) — exact — and the cast back to the
accumulator type is lossless for any realistic embedding magnitude
(18 integer digits of headroom).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str, exact: bool = False) -> Column:
    """Dot product of two equal-length array columns (double result)."""
    a, b = _c(a), _c(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    if exact:
        acc = F.aggregate(
            prods,
            F.lit(0).cast("decimal(30,12)"),
            lambda s, x: (s + x.cast("decimal(30,12)")).cast("decimal(30,12)"),
        )
        return acc.cast("double")
    return F.aggregate(prods, F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column | str, exact: bool = False) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(dot_product(a, a, exact=exact))


def cosine_similarity(
    a: Column | str, b: Column | str, exact: bool = False
) -> Column:
    """Cosine similarity; NULL-safe via nullif on zero norms."""
    num = dot_product(a, b, exact=exact)
    den = l2_norm(a, exact=exact) * l2_norm(b, exact=exact)
    return num / F.nullif(den, F.lit(0.0))
