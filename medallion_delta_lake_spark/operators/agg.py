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
