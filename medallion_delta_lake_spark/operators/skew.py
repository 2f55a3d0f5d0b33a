"""Skew-handling operators: salting for hot keys (SURVEY.md §2.11
extension surface — no reference counterpart; the reference's data is
small enough that skew never surfaces).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the cases AQE can't fix —
a grouped aggregation where one key holds half the data, or a join
whose hot key overwhelms a single task even after splitting.

Two-phase salted aggregation: phase 1 groups by (key, salt) so the hot
key's rows spread over ``salt_buckets`` tasks and partial-aggregate in
parallel; phase 2 re-aggregates the ``salt_buckets`` partials per key.
Only works for algebraic aggregates (sum/count/min/max — anything with
a merge function); the result is identical to the unsalted groupBy,
which is exactly what the oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_buckets: int = 16,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """Skew-safe grouped sum+count via two-phase salting. Decimal
    accumulation keeps the re-aggregated sum exact (float partials
    would make the result depend on the salt split)."""
    keys = list(keys)
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("_ps"),
        F.count(F.lit(1)).alias("_pc"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_ps").cast("double").alias(sum_alias),
        F.sum("_pc").alias(count_alias),
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the hot keys of ``skewed`` spread over
    ``salt_buckets`` reducers; ``other`` is replicated ×``salt_buckets``
    (explode on a literal salt array) so every (key, salt) bucket finds
    its match. Join keys become (keys…, salt); result is identical to
    the plain join, minus the single straggler task that a 100×-hot key
    otherwise creates.

    Use when BOTH sides are too big to broadcast and AQE's skew-join
    split can't apply (e.g. the skewed side feeds from an aggregation
    whose partitioning Spark wants to reuse, or the join is the
    build side of a further operator). Cost model: replicating the
    non-skewed side ×S is worth one eliminated straggler when
    |other| × S ≪ |skewed_hot_key|. ``how`` supports inner/left
    (semantics preserved because every skewed row keeps exactly its
    original match set — the salt only routes, never filters).

    Measured payoff on a 100×-skewed key: see BASELINE.md
    "Skewed-join lever".
    """
    if how not in ("inner", "left"):
        # right/full would emit each unmatched replicated `other` row
        # once per salt bucket — salt routes the skewed side only
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}"
        )
    keys = list(keys)
    lefts = skewed.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    rights = other.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = lefts.join(rights, on=[*keys, "_salt"], how=how)
    return out.drop("_salt")
