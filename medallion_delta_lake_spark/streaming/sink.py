"""Streaming sinks: foreachBatch → the generic SCD-1 upsert.

The streaming face of the medallion mutability model (SURVEY.md §2.9):
each microbatch merges into the target table by key instead of blind
appending — the pattern that keeps a continuously-ingesting silver
table equal to "latest row per key" without batch re-runs.

Scale notes: each microbatch merge touches only files holding matched
keys (Delta path) — state cost is the merge join per batch, not
O(table). ``delete_missing`` is forced False: a microbatch is an
increment, never a full snapshot, so absent keys must survive.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from medallion_delta_lake_spark.operators import upsert as upsert_mod


def stream_upsert(
    sdf: DataFrame,
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    version_col: str | None = None,
    partition_col: str | None = None,
):
    """Run a streaming DataFrame into a keyed table via per-microbatch
    upsert (availableNow trigger; returns the finished query). The
    batch function is the same ``upsert`` the batch pipeline uses —
    one mutation semantics, two execution modes."""

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_mod.upsert(
            spark,
            batch_df,
            path,
            keys=keys,
            partition_col=partition_col,
            delete_missing=False,
            version_col=version_col,
        )

    q = (
        sdf.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", path.rstrip("/") + "__checkpoint")
        .start()
    )
    q.awaitTermination()
    return q
