"""Streaming query surface: Structured Streaming plans executed with
the availableNow trigger into a memory sink, oracle-checked against
the equivalent batch SQL (batch/stream duality — same logical result,
incrementally maintained)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from medallion_delta_lake_spark.plans.registry import query
from medallion_delta_lake_spark.streaming import events as se


@query(
    "stream-window-agg",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_window_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / watermarked tumbling-window aggregate — the
    incremental twin of window-agg-tumbling, run to completion over the
    available input (complete mode exposes the full maintained state,
    which must equal the batch result)."""
    sdf = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(se.windowed_agg(sdf), "complete", spark)


@query(
    "stream-dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / dropDuplicates on a business key — one state row per
    key, first occurrence emitted; projected to the key so the result
    is order-independent."""
    sdf = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.stream_dedup_keys(sdf, ["user_id", "event_type"]), "append", spark
    )
