"""Derivation operators (SURVEY.md §2.2 derive-column, §2.8 expressions).

The reference's signature temporal trick is *availability-time
derivation*: each feed's effective timestamp is shifted by its known
publication delay, and the gold layer as-of-aligns facts to feeds with
plain equi-joins on those engineered columns (SURVEY.md §1).

Reference parity:
- with_availability        ← datetime + INTERVAL 1 DAY
  (silver_table_creation.py:137)
- with_availability_by_hour ← CASE WHEN HOUR(dt) < 11 THEN +1 DAY ELSE +2 DAY
  (silver_table_creation.py:323-326)
- round_coordinates        ← ROUND(latitude, 1) join-key normalization
  (silver_table_creation.py:243,252,290)
- rename_columns / drop_columns ← gold_table_creation.py:36,65,88 / 78,92,158
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_column(df: DataFrame, name: str, expr: Column | str) -> DataFrame:
    """Add a computed column (string exprs go through the SQL parser)."""
    return df.withColumn(name, F.expr(expr) if isinstance(expr, str) else expr)


def with_availability(
    df: DataFrame, ts_col: str, delay: str, out_col: str
) -> DataFrame:
    """available_time = effective_time + fixed publication delay.

    ``delay`` is an INTERVAL literal body, e.g. ``"1 DAY"`` or
    ``"36 HOURS"``.
    """
    return df.withColumn(out_col, F.col(ts_col) + F.expr(f"INTERVAL {delay}"))


def with_availability_by_hour(
    df: DataFrame,
    ts_col: str,
    out_col: str,
    cutoff_hour: int = 11,
    early_delay: str = "1 DAY",
    late_delay: str = "2 DAY",
) -> DataFrame:
    """Hour-dependent publication delay (reference's historical weather rule:
    rows effective before ``cutoff_hour`` arrive a day earlier)."""
    c = F.col(ts_col)
    return df.withColumn(
        out_col,
        F.when(F.hour(c) < cutoff_hour, c + F.expr(f"INTERVAL {early_delay}")).otherwise(
            c + F.expr(f"INTERVAL {late_delay}")
        ),
    )


def round_coordinates(
    df: DataFrame, cols: Sequence[str] = ("latitude", "longitude"), scale: int = 1
) -> DataFrame:
    """Round join-key coordinates so feeds on slightly different grids align."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), scale))
    return out


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Bulk rename as a single projection (one select, not N withColumnRenamed)."""
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    return df.drop(*cols)
