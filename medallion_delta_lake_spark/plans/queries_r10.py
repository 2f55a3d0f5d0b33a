"""Round-10 registered queries: the Delta identity-column write/read
round-trip and the streaming general-MERGE (CDC) sink — the two write
paths the verdict asked to put under driver evidence.

Both build their tables under a per-process tmp dir (the driver and a
concurrent local sweep must not race on the same path), keep every
driver-face column integer/string (the round-10 determinism posture),
and oracle against plain SQL over the same source parquet — proving
the committed table state equals the declarative equivalent.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans.registry import query, table


def _scratch(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(
        tempfile.gettempdir(), f"mdls_r10_{tag}_{os.getpid()}", name
    )


@query(
    "scan-delta-identity",
    # identity values are oracle-expressible because the two appends
    # write ONE sorted partition each: batch 1 (event_id % 11 = 0)
    # takes ids 1000, 1003, ... in event_id order; batch 2
    # (% 11 = 5) CONTINUES past batch 1's high-water mark — the
    # restart-monotonicity contract on the driver-checked face
    oracle="""
    WITH b1 AS (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (ORDER BY event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM events WHERE event_id % 11 = 0
    ),
    b2 AS (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (ORDER BY event_id) AS rn
      FROM events WHERE event_id % 11 = 5
    )
    SELECT 1000 + 3 * (rn - 1) AS row_id, event_id, event_type
    FROM b1
    UNION ALL
    SELECT 1000 + 3 * (n + rn - 1) AS row_id, b2.event_id,
           b2.event_type
    FROM b2, (SELECT ANY_VALUE(n) AS n FROM b1)
    """,
)
def scan_delta_identity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lifecycle / identity-column round-trip — create a GENERATED
    ALWAYS AS IDENTITY table (start 1000, step 3), append two
    deterministic event batches (each written as one sorted
    partition so the allocation order is ROW_NUMBER-expressible),
    and read the committed state back through the log engine. The
    oracle recomputes the identical ids from the source parquet:
    batch 2's ids prove the high-water mark persisted in metaData
    and generation resumed past it (sources/identity.py). All-integer
    face."""
    from medallion_delta_lake_spark.sources import identity as idm
    from medallion_delta_lake_spark.sources.delta_log import read_delta

    p = _scratch(sf_dir, "identity_events")
    shutil.rmtree(os.path.dirname(p), ignore_errors=True)
    ev = table(spark, sf_dir, "events").select("event_id", "event_type")
    idm.create_identity_table(
        spark, p, ev.schema, "row_id", start=1000, step=3
    )
    for m in (0, 5):
        batch = (
            ev.filter(F.col("event_id") % 11 == m)
            .repartition(1)
            .sortWithinPartitions("event_id")
        )
        idm.append_with_identity(spark, batch, p)
    return read_delta(spark, p).select(
        "row_id", "event_id", "event_type"
    )


@query(
    "stream-merge-clauses",
    # the streamed CDC MERGE's final table state == the declarative
    # join: VIP bump (first-true beats the generic update), ACTIVE
    # refresh, NEW insert for keys outside the base; integer cents
    # everywhere, so the face is engine-exact by construction
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents,
             CAST(0 AS BIGINT) AS n_orders,
             'BASE' AS status
      FROM customer WHERE c_custkey % 17 = 0
    ),
    feed AS (
      SELECT o_custkey AS c_custkey,
             SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS total_cents,
             COUNT(*) AS n_orders
      FROM orders WHERE o_custkey % 17 IN (0, 1)
      GROUP BY o_custkey
    )
    SELECT b.c_custkey,
           CASE WHEN f.c_custkey IS NOT NULL
                     AND f.total_cents > 40000000
                THEN b.bal_cents + 1000 ELSE b.bal_cents END
             AS bal_cents,
           CASE WHEN f.c_custkey IS NOT NULL THEN f.n_orders
                ELSE b.n_orders END AS n_orders,
           CASE WHEN f.c_custkey IS NOT NULL
                     AND f.total_cents > 40000000 THEN 'VIP'
                WHEN f.c_custkey IS NOT NULL THEN 'ACTIVE'
                ELSE b.status END AS status
    FROM base b LEFT JOIN feed f ON b.c_custkey = f.c_custkey
    UNION ALL
    SELECT f.c_custkey, f.total_cents AS bal_cents, f.n_orders,
           'NEW' AS status
    FROM feed f LEFT JOIN base b ON b.c_custkey = f.c_custkey
    WHERE b.c_custkey IS NULL
    """,
)
def stream_merge_clauses_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / CDC MERGE sink — seed a log-backed customer-state
    table, stream a per-customer order rollup at it through
    ``stream_merge_clauses`` (foreachBatch → the log engine's general
    MERGE, availableNow), and return the committed final state. The
    feed is staged as three parquet files DISJOINT BY KEY HASH and
    consumed one file per microbatch (maxFilesPerTrigger=1), so the
    final state is independent of batch order — three real
    merge commits land in the log. Ordered first-true clause
    semantics on the checked face: conditional VIP update beats the
    generic ACTIVE refresh; unmatched feed keys insert as NEW
    (streaming/sink.py:stream_merge_clauses,
    sources/delta_log.py:merge_delta_log)."""
    from medallion_delta_lake_spark.sources.delta_log import (
        read_delta,
        write_delta,
    )
    from medallion_delta_lake_spark.streaming.sink import (
        stream_merge_clauses,
    )

    root = _scratch(sf_dir, "")
    shutil.rmtree(root, ignore_errors=True)
    target = os.path.join(root, "cust_state")
    feed_dir = os.path.join(root, "merge_feed")

    base = table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 17 == 0
    ).select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100)
        .cast("long")
        .alias("bal_cents"),
        F.lit(0).cast("long").alias("n_orders"),
        F.lit("BASE").alias("status"),
    )
    write_delta(spark, base.coalesce(2), target, mode="append")

    feed = (
        table(spark, sf_dir, "orders")
        .filter((F.col("o_custkey") % 17).isin(0, 1))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("long")
            ).alias("total_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # three files disjoint by key hash → any microbatch order commits
    # the same final state (each key merges exactly once)
    feed.repartition(3, F.col("c_custkey") % 3).write.mode(
        "overwrite"
    ).parquet(feed_dir)

    sdf = (
        spark.readStream.schema(
            "c_custkey long, total_cents long, n_orders long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    clauses = [
        {
            "when": "matched",
            "action": "update",
            "condition": "s.total_cents > 40000000",
            "set": {
                "bal_cents": "d.bal_cents + 1000",
                "n_orders": "s.n_orders",
                "status": "'VIP'",
            },
        },
        {
            "when": "matched",
            "action": "update",
            "set": {"n_orders": "s.n_orders", "status": "'ACTIVE'"},
        },
        {
            "when": "not_matched",
            "action": "insert",
            "values": {
                "c_custkey": "s.c_custkey",
                "bal_cents": "s.total_cents",
                "n_orders": "s.n_orders",
                "status": "'NEW'",
            },
        },
    ]
    stream_merge_clauses(
        sdf, spark, target, ["c_custkey"], clauses
    )
    return read_delta(spark, target).select(
        "c_custkey", "bal_cents", "n_orders", "status"
    )
