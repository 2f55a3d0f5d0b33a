"""Space-filling-curve keys for multi-dimensional data clustering.

``morton_key`` interleaves the low bits of two dimensions into one
sort key (Z-order). Sorting/compacting a table by it co-locates rows
that are close in BOTH dimensions, so parquet row-group min/max
pruning works for predicates on either column — the mechanism behind
Delta's OPTIMIZE ZORDER, expressed as a plain Catalyst expression
(pure bit arithmetic, codegen'd, reproducible in ANSI SQL for the
oracle).

Use with sources.writers.compact(sort_cols=[zkey]) as the maintenance
pass; at 100 TB this is how a table serves selective scans on two keys
without duplicating storage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative int columns:
    result bit 2i = bit i of a, bit 2i+1 = bit i of b."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return key


def morton_key_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_key` (identical values)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def morton_key_n(cols: list, bits: int = 16) -> "Column":
    """Interleave the low ``bits`` of k non-negative int columns:
    result bit ``k·i + j`` = bit ``i`` of column ``j`` — the
    k-dimensional Morton key behind multi-column OPTIMIZE ZORDER.
    ``k·bits`` must stay ≤ 62 so the key fits a BIGINT; callers
    shrink ``bits`` as k grows (62 // k)."""
    k = len(cols)
    if k == 0:
        raise ValueError("morton_key_n needs at least one column")
    if k * bits > 62:
        raise ValueError(
            f"{k} columns × {bits} bits = {k * bits} > 62 key bits; "
            f"use bits ≤ {62 // k}"
        )
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cs):
            key = key + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), k * i + j
            )
    return key
