"""DRAFT round-18 query faces — NOT registered (cohorts r13..r17 are
queued ahead; registering early would mint registered-never-checked
ids). Same proof protocol as every cohort since r10:
tests/test_r18_drafts.py proves each face compare_query-green at two
SFs before registration is ever considered.

- stream-cdf-tail — the STREAMING change-data-feed source built this
  round (sources/python_datasource.py:_CdfStreamReader,
  ``format("mdls_delta").option("readChangeFeed", "true")``): a
  scratch table lives through overwrite → CDF-on → append →
  DELETE-by-DV → UPDATE (cdc files), and one availableNow run of the
  feed must reproduce every commit's inserts/deletes/pre/postimages
  — aggregated per (_commit_version, _change_type) with exact cents
  sums the oracle recomputes from the raw events. This is the
  incremental-consumer API: downstream state maintenance reads ONLY
  the changes, never a snapshot.
- stream-cdf-replica — the full consumer: a foreachBatch fold of the
  feed into a replica Delta table
  (operators/incremental.py:replicate_from_changes), whose final
  state must equal the source's even though no source snapshot was
  ever read — streaming replication driven end to end.
"""

from __future__ import annotations

import hashlib as _hashlib
import os as _os
import shutil as _shutil
import tempfile as _tempfile
import uuid as _uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans.registry import table

R18_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
R18_ORACLES: dict[str, str] = {}


def draft(name: str, oracle: str):
    def deco(fn):
        R18_QUERIES[name] = fn
        R18_ORACLES[name] = oracle
        return fn

    return deco


def _scratch(sf_dir: str, name: str) -> str:
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return _os.path.join(
        _tempfile.gettempdir(), f"mdls_r18_{tag}_{_os.getpid()}", name
    )


@draft(
    "stream-cdf-tail",
    # the staged life: v0 overwrite (%4==1), v1 props (silent),
    # v2 append (%4==2), v3 DELETE cents<=5000 (DV), v4 UPDATE
    # cents>20000 -> 0 (cdc pre/postimage); the oracle rebuilds each
    # commit's change set from the raw events
    oracle="""
    WITH sub AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             event_id % 4 AS m
      FROM events WHERE value IS NOT NULL
    ),
    v0 AS (
      SELECT CAST(0 AS BIGINT) AS _commit_version,
             'insert' AS _change_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents_sum
      FROM sub WHERE m = 1
    ),
    v2 AS (
      SELECT CAST(2 AS BIGINT), 'insert',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(cents) AS BIGINT)
      FROM sub WHERE m = 2
    ),
    v3 AS (
      SELECT CAST(3 AS BIGINT), 'delete',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(cents) AS BIGINT)
      FROM sub WHERE m IN (1, 2) AND cents <= 5000
    ),
    v4pre AS (
      SELECT CAST(4 AS BIGINT), 'update_preimage',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(cents) AS BIGINT)
      FROM sub WHERE m IN (1, 2) AND cents > 20000
    ),
    v4post AS (
      SELECT CAST(4 AS BIGINT), 'update_postimage',
             CAST(COUNT(*) AS BIGINT),
             CAST(0 AS BIGINT)
      FROM sub WHERE m IN (1, 2) AND cents > 20000
    )
    SELECT * FROM v0 UNION ALL SELECT * FROM v2
    UNION ALL SELECT * FROM v3 UNION ALL SELECT * FROM v4pre
    UNION ALL SELECT * FROM v4post
    """,
)
def stream_cdf_tail_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / change-data-feed tail — the incremental-consumer
    path: a downstream job subscribes to a table's CHANGES
    (``readStream.format("mdls_delta").option("readChangeFeed",
    "true")``) instead of re-reading snapshots, so maintaining a
    replica/aggregate costs O(changed rows) per batch at any table
    size. The staged table lives through overwrite, CDF-enable
    (dataChange:false — provably SILENT in the feed), append,
    DELETE-by-deletion-vector (the feed emits exactly the
    newly-flagged rows with their PRE-delete values), and UPDATE on a
    CDF-enabled table (read from the commit's ``_change_data`` files
    — paired update_preimage/update_postimage rows). One availableNow
    pass aggregates the whole feed per (_commit_version,
    _change_type) with exact cents sums
    (sources/python_datasource.py:_CdfStreamReader;
    tests/test_cdf_stream.py adds checkpointed-resume coverage)."""
    from medallion_delta_lake_spark.sources import (
        delta_log as dl,
        python_datasource as pds,
    )

    pds.register(spark)
    p = _scratch(sf_dir, "cdf_tail")
    _shutil.rmtree(p, ignore_errors=True)
    sub = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            (F.col("event_id") % 4).alias("m"),
        )
    )
    dl.write_delta(
        spark,
        sub.filter(F.col("m") == 1).drop("m").coalesce(2),
        p,
        mode="overwrite",
    )
    dl.set_table_properties(
        p, {"delta.enableChangeDataFeed": "true"}
    )
    dl.write_delta(
        spark,
        sub.filter(F.col("m") == 2).drop("m").coalesce(1),
        p,
        mode="append",
    )
    dl.delete_delta_log(spark, p, [("cents", "<=", 5000)])
    dl.update_delta_log(
        spark, p, [("cents", ">", 20000)], {"cents": "0"}
    )
    name = f"mdls_cdf_{_uuid.uuid4().hex[:12]}"
    q = (
        spark.readStream.format(pds.FORMAT_NAME)
        .option("path", p)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).groupBy(
        "_commit_version", "_change_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents_sum"),
    )


# ------------------------------------------------------------------
# stream-cdf-replica


@draft(
    "stream-cdf-replica",
    # the replica's final state must equal the source's: m in (1,2),
    # minus the DV-deleted cents<=5000 rows, updated rows at 0
    oracle="""
    WITH sub AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE value IS NOT NULL AND event_id % 4 IN (1, 2)
    ),
    state AS (
      SELECT event_id, event_type,
             CASE WHEN cents > 20000 THEN 0 ELSE cents END AS cents
      FROM sub WHERE cents > 5000
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum
    FROM state GROUP BY event_type
    """,
)
def stream_cdf_replica_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / change-feed REPLICATION — the full downstream
    pattern the CDF source exists for: a foreachBatch consumer folds
    each microbatch of changes into a replica Delta table
    (operators/incremental.py:replicate_from_changes — latest
    non-preimage action per key wins; O(changed keys) per batch,
    never O(table)), so after the availableNow run the REPLICA must
    equal the SOURCE's final state even though no snapshot of the
    source was ever read. The staged source lives through overwrite,
    CDF-enable, append, DELETE-by-DV, and a cdc UPDATE — the replica
    sees them only as feed rows. The face aggregates the replica;
    the oracle rebuilds the expected end state from raw events."""
    from medallion_delta_lake_spark.operators.incremental import (
        replicate_from_changes,
    )
    from medallion_delta_lake_spark.sources import (
        delta_log as dl,
        python_datasource as pds,
    )

    pds.register(spark)
    src = _scratch(sf_dir, "cdf_rep_src")
    rep = _scratch(sf_dir, "cdf_rep_dst")
    ckpt = _scratch(sf_dir, "cdf_rep_ckpt")
    for d in (src, rep, ckpt):
        _shutil.rmtree(d, ignore_errors=True)
    sub = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            (F.col("event_id") % 4).alias("m"),
        )
    )
    dl.write_delta(
        spark,
        sub.filter(F.col("m") == 1).drop("m").coalesce(2),
        src,
        mode="overwrite",
    )
    dl.set_table_properties(
        src, {"delta.enableChangeDataFeed": "true"}
    )
    dl.write_delta(
        spark,
        sub.filter(F.col("m") == 2).drop("m").coalesce(1),
        src,
        mode="append",
    )
    dl.delete_delta_log(spark, src, [("cents", "<=", 5000)])
    dl.update_delta_log(
        spark, src, [("cents", ">", 20000)], {"cents": "0"}
    )
    # seed an EMPTY replica with the source's data schema
    dl.write_delta(
        spark,
        sub.drop("m").limit(0).coalesce(1),
        rep,
        mode="overwrite",
    )

    def fold(batch: DataFrame, batch_id: int) -> None:
        replica = dl.read_delta(spark, rep)
        merged = replicate_from_changes(
            replica, batch, keys=["event_id"]
        )
        dl.write_delta(spark, merged.coalesce(2), rep, mode="overwrite")

    q = (
        spark.readStream.format(pds.FORMAT_NAME)
        .option("path", src)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        dl.read_delta(spark, rep)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents_sum"),
        )
    )
