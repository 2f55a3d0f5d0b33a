"""Cleaning operators (SURVEY.md §2.2, §2.4 dedup, §2.7 nulls).

Reference parity:
- dedup_full_row   ← dropDuplicates() before every merge
  (silver_table_creation.py:32,75,120,183,309,402)
- dropna_any       ← dropna(how='any')
  (silver_table_creation.py:35,78,... ; gold_table_creation.py:62,85)
- filter_neq / filter_not_in / filter_range / filter_isnull
  ← silver_table_creation.py:39,249; gold_table_creation.py:47,126
- null_profile     ← the commented per-column null probes
  (silver_table_creation.py:140-141 etc.) — the reference's dict
  comprehension runs one Spark job per column (N full scans, quirk Q5);
  this version is a single-pass conditional aggregation: one scan,
  map-side partial aggs, no matter how many columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dedup_full_row(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate elimination (all columns, or a subset).

    Physically a hash-repartition on the dedup columns + first-row
    aggregation; Catalyst plans a partial (map-side) dedup before the
    shuffle, so at scale the shuffle carries only distinct rows.
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dropna_any(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Drop rows with any NULL (optionally restricted to ``subset``)."""
    return df.na.drop(how="any", subset=list(subset) if subset else None)


def filter_neq(df: DataFrame, col: str, value) -> DataFrame:
    """Remove a sentinel value (reference: county != 12)."""
    return df.filter(F.col(col) != F.lit(value))


def filter_not_in(df: DataFrame, col: str, values: Sequence) -> DataFrame:
    """Chained inequality filters (reference: drop data_block_id 0,1)."""
    return df.filter(~F.col(col).isin(list(values)))


def filter_range(
    df: DataFrame, col: str, lower, upper, inclusive: bool = False
) -> DataFrame:
    """Range predicate (reference: hours_ahead > 23 AND < 48)."""
    c = F.col(col)
    cond = (c >= lower) & (c <= upper) if inclusive else (c > lower) & (c < upper)
    return df.filter(cond)


def filter_isnull(df: DataFrame, col: str, keep_null: bool = True) -> DataFrame:
    """Select rows where ``col`` IS (NOT) NULL (reference: county_id IS NULL)."""
    c = F.col(col)
    return df.filter(c.isNull() if keep_null else c.isNotNull())


def null_profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Single-row frame of per-column null counts — one pass over the data."""
    cols = list(columns) if columns else df.columns
    aggs: list[Column] = [
        F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(c) for c in cols
    ]
    return df.agg(*aggs)
