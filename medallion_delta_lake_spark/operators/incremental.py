"""Incremental view maintenance for grouped additive aggregates —
fold a Delta CHANGE FEED batch into a stored (count, sums) rollup
instead of rescanning the table (SURVEY.md §2.11 extension surface;
the reference recomputes its gold rollups from scratch each run —
``gold_table_creation.py`` — so this is the maintained-materialization
upgrade of that path).

Counts and sums form an abelian group (every delete is an exact
inverse), so the maintained state equals a from-scratch rollup of the
final table EXACTLY — the same turnstile property
``operators/sketches.py:cms_apply_changes`` exploits, lifted to the
plain-aggregate case. Non-invertible aggregates (min/max/distinct)
are deliberately NOT offered here: their delete path is the epoch
rebuild (``sketches.sketch_epoch_rebuild``) — documented so nobody
wires a MAX into a change feed and silently keeps a deleted maximum.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_sum_apply_changes(
    stored: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sum_cols: dict[str, str],
    n_col: str = "n",
) -> DataFrame:
    """Refresh a grouped rollup ``stored`` (``keys…, n_col`` + the
    ``sum_cols`` KEYS) from a ``table_changes`` batch (the table's
    SOURCE columns + ``_change_type``): ``insert``/``update_postimage``
    rows add (+1, +value), ``delete``/``update_preimage`` rows
    subtract — one grouped pass over the CHANGED rows only, then a
    key-keyed full-outer merge with the stored state. Groups whose
    count drops to zero disappear (exactly like a re-aggregation
    would).

    ``sum_cols`` maps each stored sum column to the SOURCE column it
    sums (e.g. ``{"sum_cents": "cents"}`` — the feed carries the
    table's columns, not the rollup's aliases).

    Scale posture: the change batch is typically a tiny fraction of
    the table, so the refresh costs O(changed rows) + a join whose
    left side is |groups| rows — vs O(table) for a rescan. Sums
    should be exact types (BIGINT / DECIMAL): float sums would drift
    from the rebuild under churn; the caller quantizes first (the
    registry cents contract)."""
    keys = list(keys)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"),
        F.lit(1),
    ).otherwise(F.lit(-1))
    delta = (
        changes.select(
            *keys, sign.alias("_sign"), *set(sum_cols.values())
        )
        .groupBy(*keys)
        .agg(
            F.sum("_sign").cast("bigint").alias(f"_d_{n_col}"),
            *[
                F.sum(F.col(src) * F.col("_sign")).alias(f"_d_{c}")
                for c, src in sum_cols.items()
            ],
        )
    )
    merged = stored.join(delta, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col(n_col), F.lit(0).cast("bigint"))
            + F.coalesce(F.col(f"_d_{n_col}"), F.lit(0).cast("bigint"))
        ).alias(n_col),
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
    )
    return merged.filter(F.col(n_col) > 0)
