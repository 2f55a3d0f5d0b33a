"""Aggregation operators (SURVEY.md §2.4).

Reference parity:
- avg_groupby_dynamic ← the SQL-string-templated "group by keys, avg
  everything else" (silver_table_creation.py:347-361;
  gold_table_creation.py:103-116,134-145). The engine expresses it
  directly as groupBy().agg() over a computed column list — no temp
  view, no string templating; Catalyst still plans partial+final
  HashAggregate with map-side combine, so the shuffle carries one row
  per (group, partition), not the raw data.
- profile            ← the commented count/distinct diagnostics
  (silver_table_creation.py:128-133; gold_table_creation.py:60,71,75),
  consolidated into one single-pass aggregation.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def avg_groupby_dynamic(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
    alias_prefix: str = "",
) -> DataFrame:
    """Group by ``keys``; average every other (or given) column.

    ``alias_prefix`` reproduces the reference's ``historical_*`` /
    forecast renames (gold_table_creation.py:105-116) in the same
    projection — no second pass.
    """
    keys = list(keys)
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in keys]
    aggs = [F.avg(c).alias(f"{alias_prefix}{c}") for c in value_cols]
    return df.groupBy(*keys).agg(*aggs)


def agg_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, str],
) -> DataFrame:
    """Generic group-by: ``aggs`` maps output alias → SQL agg expression."""
    exprs = [F.expr(e).alias(a) for a, e in aggs.items()]
    return df.groupBy(*[F.col(k) for k in keys]).agg(*exprs)


def profile(df: DataFrame, distinct_cols: Sequence[str] = ()) -> DataFrame:
    """One-pass table profile: row count + exact distincts for given cols."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in distinct_cols:
        aggs.append(F.countDistinct(F.col(c)).alias(f"n_distinct_{c}"))
    return df.agg(*aggs)


def approx_profile(df: DataFrame, distinct_cols: Sequence[str] = ()) -> DataFrame:
    """Scale path of :func:`profile`: HyperLogLog++ distincts (no exact
    count-distinct shuffle; constant memory per column at 100 TB)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in distinct_cols:
        aggs.append(
            F.approx_count_distinct(F.col(c)).alias(f"approx_distinct_{c}")
        )
    return df.agg(*aggs)


def gini_impurity(
    df: DataFrame,
    group_cols: Sequence[str],
    class_col: str,
) -> DataFrame:
    """Per-group Gini impurity of a categorical column:
    ``1 - Σ_c (n_c / n)²`` — the class-diversity measure (0 = one
    class, →1 = uniform over many). Chosen over Shannon entropy for
    the oracle-exactness contract: Gini is pure rational arithmetic
    (integer counts, one IEEE division and multiply per class —
    bit-identical in any engine), where entropy's log() differs at the
    last ulp across libm implementations.

    Kept integral to the last step: ``1 - Σn_c²/n²`` — the sums are
    exact BIGINTs, the single closing division is one IEEE op. Two
    partial-aggregating shuffles on (group, class) then (group):
    map-side combine keeps shuffle rows at one per distinct pair per
    partition; nothing driver-side. Output: group cols, ``n`` (rows),
    ``n_classes``, ``gini``."""
    counts = df.groupBy(*group_cols, class_col).agg(
        F.count(F.lit(1)).alias("_n_c")
    )
    return counts.groupBy(*group_cols).agg(
        F.sum("_n_c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        (
            F.lit(1.0)
            - F.sum(F.col("_n_c") * F.col("_n_c")).cast("double")
            / (
                F.sum("_n_c").cast("double")
                * F.sum("_n_c").cast("double")
            )
        ).alias("gini"),
    )


def mode_exact(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Exact per-group mode with a DETERMINISTIC tie-break (highest
    count, then smallest value) — unlike ``F.mode``, whose tie winner
    is partition-order-dependent and therefore irreproducible across
    engines/runs. Output: group cols, ``mode_value``, ``mode_count``.

    Plan: one (group, value) partial-aggregated count, one window
    rank over the (far smaller) count table — the raw data shuffles
    once, keyed by (group, value) with map-side combine."""
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_n").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *group_cols,
            F.col(value_col).alias("mode_value"),
            F.col("_n").cast("bigint").alias("mode_count"),
        )
    )
