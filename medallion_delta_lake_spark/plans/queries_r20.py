"""DRAFT round-20 query faces — NOT registered (cohorts r13..r19 are
queued ahead). Same proof protocol as every cohort since r10:
tests/test_r20_drafts.py proves each face compare_query-green at two
SFs before registration is ever considered.

- maintenance-rename-timetravel — ALTER ... RENAME COLUMN as a
  METADATA-ONLY commit (sources/delta_log.py:rename_column, which
  auto-enables name-mode column mapping and bumps the protocol), with
  BOTH sides of the schema timeline proven in one face: the current
  snapshot reads under the NEW logical name while every data file
  keeps its physical name untouched, and a version_as_of read of the
  pre-rename snapshot still serves the OLD name — schema time travel,
  the thing a plain-parquet rename (full rewrite) can never give.
- maintenance-check-constraint — ALTER TABLE ADD CONSTRAINT driven
  through enforcement: a violating append is refused ATOMICALLY
  (DeltaInvariantViolationError, zero rows land), a compliant one
  commits — the engine-level data-quality gate dq-constraint-check
  only audits.
"""

from __future__ import annotations

import hashlib as _hashlib
import os as _os
import shutil as _shutil
import tempfile as _tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans.registry import table

R20_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
R20_ORACLES: dict[str, str] = {}


def draft(name: str, oracle: str):
    def deco(fn):
        R20_QUERIES[name] = fn
        R20_ORACLES[name] = oracle
        return fn

    return deco


def _scratch(sf_dir: str, name: str) -> str:
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return _os.path.join(
        _tempfile.gettempdir(), f"mdls_r20_{tag}_{_os.getpid()}", name
    )


@draft(
    "maintenance-rename-timetravel",
    # both snapshots must serve the SAME data — current under the new
    # logical name, v0 under the old one; the labels pin which schema
    # answered
    oracle="""
    WITH sub AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND event_id % 2 = 0
    ),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM sub GROUP BY event_type
    )
    SELECT 'current_new_name' AS snapshot, event_type, n, total
    FROM agg
    UNION ALL
    SELECT 'v0_old_name', event_type, n, total FROM agg
    """,
)
def maintenance_rename_timetravel_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / metadata-only column rename + schema time travel
    — ALTER ... RENAME COLUMN under name-mode column mapping
    (sources/delta_log.py:rename_column — auto-enables mapping,
    physicalName pins every already-written file, protocol advances):
    the CURRENT snapshot must answer under the NEW logical name
    (amount_cents) and a version_as_of=0 read must still answer under
    the OLD name (cents) — with identical data, because no file was
    rewritten. On plain parquet this rename is a full-table rewrite;
    here it is one O(metadata) commit — the 100 TB schema-evolution
    story driven end to end. The face unions both labeled reads; the
    oracle serves the same aggregate twice."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "rename_tt")
    _shutil.rmtree(p, ignore_errors=True)
    sub = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("event_id") % 2 == 0))
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    dl.write_delta(spark, sub.coalesce(2), p, mode="overwrite")
    dl.rename_column(p, "cents", "amount_cents")

    cur = (
        dl.read_delta(spark, p)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("amount_cents").cast("bigint").alias("total"),
        )
        .select(
            F.lit("current_new_name").alias("snapshot"),
            "event_type",
            "n",
            "total",
        )
    )
    old = (
        dl.read_delta(spark, p, version_as_of=0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total"),
        )
        .select(
            F.lit("v0_old_name").alias("snapshot"),
            "event_type",
            "n",
            "total",
        )
    )
    return cur.unionByName(old)


# ------------------------------------------------------------------
# maintenance-check-constraint


@draft(
    "maintenance-check-constraint",
    # the violating append must be REFUSED atomically (no partial
    # rows), the compliant one must land; refusal count pinned
    oracle="""
    WITH sub AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             event_id % 3 AS m
      FROM events WHERE value IS NOT NULL
    ),
    state AS (
      SELECT event_type, cents FROM sub
      WHERE (m = 0 AND cents > 500) OR (m = 1 AND cents > 500)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           CAST(1 AS BIGINT) AS n_refused
    FROM state GROUP BY event_type
    """,
)
def maintenance_check_constraint_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / CHECK constraint enforcement — ALTER TABLE ADD
    CONSTRAINT (cents > 500) on a seeded table
    (sources/delta_log.py:add_check_constraint, writer protocol bumps
    to the checkConstraints version), then: an append containing
    violating rows is REFUSED ATOMICALLY (DeltaInvariantViolationError
    — zero rows of the batch land, not just the bad ones; the
    write-side scan names the violating expression), and a compliant
    append commits normally. The final table therefore holds exactly
    the seed + the compliant batch — any leak of the refused batch
    breaks the row-hash — with the refusal count pinned. This is the
    schema-level data-quality gate dq-constraint-check only AUDITS;
    here the engine blocks the write itself."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "check_constraint")
    _shutil.rmtree(p, ignore_errors=True)
    sub = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            (F.col("event_id") % 3).alias("m"),
        )
    )
    seed = sub.filter(
        (F.col("m") == 0) & (F.col("cents") > 500)
    ).drop("m")
    dl.write_delta(spark, seed.coalesce(2), p, mode="overwrite")
    dl.add_check_constraint(spark, p, "cents_floor", "cents > 500")
    n_refused = 0
    try:  # batch with violating rows — must be refused atomically
        dl.write_delta(
            spark,
            sub.filter(F.col("m") == 1).drop("m").coalesce(1),
            p,
            mode="append",
        )
    except dl.DeltaInvariantViolationError:
        n_refused = 1
    dl.write_delta(  # compliant batch — must land
        spark,
        sub.filter((F.col("m") == 1) & (F.col("cents") > 500))
        .drop("m")
        .coalesce(1),
        p,
        mode="append",
    )
    out = dl.read_delta(spark, p).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents_sum"),
    )
    return out.withColumn(
        "n_refused", F.lit(n_refused).cast("bigint")
    )
