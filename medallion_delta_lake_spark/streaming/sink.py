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


def stream_dedup_ingest(
    sdf: DataFrame,
    spark: SparkSession,
    corpus_path: str,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
):
    """Continuously ingest documents with near-dup dedup at the door:
    each microbatch runs :func:`incremental_neardup` against the
    persistent LSH signature store (``within_batch=True``, so
    duplicates arriving together also collapse) and appends only the
    novel documents to the corpus table.

    This is the streaming face of the daily-batch corpus pipeline —
    the store means HISTORY IS NEVER RE-HASHED: each batch pays one
    hash pass over itself plus a (band, band_key)-keyed equi-join
    probe into the store, so a year of 100 TB ingest costs the same
    per day on day 365 as on day 1.

    Delivery semantics: Structured Streaming's foreachBatch is
    at-least-once, so the batch function is made IDEMPOTENT on
    ``batch_id`` — both the signature store and the corpus are laid
    out hive-partitioned by ``ingest_batch`` and each batch's output
    lands via partition-directory OVERWRITE, while the history probe
    excludes the batch's own partition (see
    :func:`incremental_neardup`'s ``batch_id`` contract). A replay
    therefore recomputes the same deterministic labels and replaces
    its own partial output: no self-duplicate drops, no double
    appends — effectively exactly-once end to end. Corpus readers see
    an extra ``ingest_batch`` partition column (batch provenance).
    """
    import os

    from medallion_delta_lake_spark.operators import dedup as dedup_mod

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import functions as F

        labeled = dedup_mod.incremental_neardup(
            spark,
            batch_df,
            store_path,
            text_col=text_col,
            id_col=id_col,
            n=n,
            num_perm=num_perm,
            bands=bands,
            within_batch=True,
            batch_id=batch_id,
        )
        novel = labeled.filter(F.col("dup_of").isNull()).drop("dup_of")
        novel.write.mode("overwrite").parquet(
            os.path.join(corpus_path, f"ingest_batch={batch_id}")
        )

    q = (
        sdf.writeStream.foreachBatch(dedup_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", corpus_path.rstrip("/") + "__checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    return q


def stream_append_delta_log(
    sdf: DataFrame,
    spark: SparkSession,
    path: str,
    app_id: str,
    partition_by: Sequence[str] | None = None,
):
    """Exactly-once streaming append into a LOG-BACKED Delta table via
    the protocol's SetTransaction handshake: each microbatch commits
    ``txn=(app_id, batch_id)`` alongside its add actions, and a
    replayed batch (foreachBatch is at-least-once) is skipped when
    ``last_txn_version`` already covers its id — the same mechanism
    delta-spark's own streaming sink uses, here on the pure-Python log
    engine. A lost check-then-write race is also closed commit-side
    (write_delta refuses a duplicate (appId, version)).

    Scale notes: the watermark probe is one snapshot resolution
    (driver metadata); batch data flows through the normal distributed
    parquet writer. Returns the finished query (availableNow)."""
    from medallion_delta_lake_spark.sources import delta_log

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if delta_log.last_txn_version(path, app_id) >= batch_id:
            return  # replay of an already-committed batch
        try:
            delta_log.write_delta(
                spark,
                batch_df,
                path,
                mode="append",
                partition_by=list(partition_by or []) or None,
                txn=(app_id, batch_id),
            )
        except delta_log.DeltaConcurrentWriteError:
            # another attempt of THIS batch won the race — idempotent
            pass

    # per-app checkpoint dir: two streams with different app_ids
    # appending to the same table must not share (and clobber) one
    # Spark streaming checkpoint's offsets/batch ids (ADVICE r6)
    import re

    safe_app = re.sub(r"[^A-Za-z0-9._-]", "_", app_id)
    q = (
        sdf.writeStream.foreachBatch(append_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            f"{path.rstrip('/')}__append_checkpoint_{safe_app}",
        )
        .start()
    )
    q.awaitTermination()
    return q


def stream_merge_clauses(
    sdf: DataFrame,
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    clauses: Sequence[dict],
):
    """Streaming face of the GENERAL MERGE: each microbatch runs the
    full whenMatched/whenNotMatched clause list against the log-backed
    table (availableNow; returns the finished query). The same
    ordered first-true semantics as sources/delta_log.merge_delta_log
    — e.g. a CDC feed whose rows carry an ``op`` column can route
    deletes/updates/inserts in ONE sink instead of pre-splitting the
    stream. Per-batch source keys are deduped by the caller's clause
    conditions' contract (multiple matches per key raise, same as the
    batch path)."""
    from medallion_delta_lake_spark.sources import delta_log

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta_log.merge_delta_log(
            spark, batch_df, path, list(keys), list(clauses)
        )

    q = (
        sdf.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", path.rstrip("/") + "__merge_checkpoint"
        )
        .start()
    )
    q.awaitTermination()
    return q
