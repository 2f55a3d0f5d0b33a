"""Window operators (SURVEY.md §2.11 extension surface).

The reference has no window functions; these back both the extension
surface (top-k per group) and internal plans (nn_assign rank-1,
latest-per-key dedup). All are single-shuffle plans: one hash partition
on the group keys, sort within partitions, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(order_by: Sequence[Column | str], descending: bool) -> list[Column]:
    """Strings get the ``descending`` direction; Column objects pass
    through untouched (caller already applied .asc()/.desc())."""
    out: list[Column] = []
    for c in order_by:
        if isinstance(c, str):
            col = F.col(c)
            out.append(col.desc() if descending else col.asc())
        else:
            out.append(c)
    return out


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    descending: bool = True,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group by ``order_by`` (row_number semantics).

    Include a unique tie-break column in ``order_by`` for deterministic
    output. At scale, prefer ties-insensitive pre-filtering (AQE handles
    skewed groups; for pathological skew, pre-aggregate a per-group
    threshold first).
    """
    w = Window.partitionBy(*group_cols).orderBy(*_order(order_by, descending))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Keep the most recent row per key — the engine's dedup-by-key
    primitive (backs upsert pre-dedup; SURVEY.md §7 'hard part 1')."""
    out = topk_per_group(
        df,
        keys,
        [ts_col, *tie_break],
        k=1,
        descending=True,
        rank_col="_rn",
    )
    return out.drop("_rn")


def running_sum(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative sum per key in event order. Accumulates in
    DECIMAL(38,6) so the running value is exact and order-stable (the
    engine's float-determinism contract), cast back to double."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c).asc() for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col,
        F.sum(F.col(value_col).cast("decimal(38,6)")).over(w).cast("double"),
    )


def lag_delta(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "delta",
) -> DataFrame:
    """value − lag(value) per key in event order (NULL for the first
    row of each key)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return df.withColumn(
        out_col, F.col(value_col) - F.lag(F.col(value_col)).over(w)
    )


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows per key with an inactivity gap: events closer
    than ``gap`` merge into one session. Built on F.session_window —
    the same operator Structured Streaming maintains incrementally
    (streaming/events.py); batch and stream agree on boundaries.
    Returns (keys, session_start, session_end, n_events)."""
    return (
        df.groupBy(*keys, F.session_window(F.col(ts_col), gap).alias("_sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("_sw.start").alias("session_start"),
            F.col("_sw.end").alias("session_end"),
            "n_events",
        )
    )
