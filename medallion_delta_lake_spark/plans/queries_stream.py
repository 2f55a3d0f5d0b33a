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
    return se.run_available_now(se.windowed_agg(sdf), "complete", spark, num_state_partitions=8)


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
        se.stream_dedup_keys(sdf, ["user_id", "event_type"]), "append",
        spark, num_state_partitions=8,
    )


@query(
    "stream-session-agg",
    # same gaps-and-islands oracle as the batch window-agg-session:
    # complete mode exposes the full maintained session state, which
    # must equal the batch sessionization exactly
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / session windows — watermarked session_window
    aggregation per user, run to completion (complete mode exposes the
    maintained state). Incrementally merges sessions as events arrive;
    verified identical to the batch sessionize operator."""
    sdf = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(se.session_agg(sdf), "complete", spark, num_state_partitions=8)


@query(
    "stream-stateful-stats",
    # with the single-file source, availableNow runs one microbatch, so
    # the update-mode emissions ARE the final per-user accumulators;
    # the integer-cents state makes totals exact in both engines
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / custom stateful — applyInPandasWithState running
    (count, sum) accumulator per user (Arrow-batched, typed state row
    per key). The cents-integer state is exact, so the maintained
    result equals the batch aggregate bit-for-bit."""
    from medallion_delta_lake_spark.streaming import stateful

    sdf = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        stateful.user_running_stats(sdf), "update", spark,
        num_state_partitions=8,
    )


@query(
    "stream-stream-join",
    # availableNow over the single-file source = one microbatch, so the
    # inner interval join emits exactly the batch-equivalent matches
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM events v JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / stream-stream join — watermarked interval join of
    two event streams (purchases to preceding views within 30 min);
    state evicts beyond the watermark horizon. Matches the batch
    interval join exactly."""
    a = se.read_events_stream(spark, sf_dir)
    b = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.stream_stream_join(a, b), "append", spark,
        num_state_partitions=8,
    )


@query(
    "stream-static-join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
    FROM events e JOIN customer c ON c.c_custkey = e.user_id % 1500
    """,
)
def stream_static_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / stream-static join — enrich a stream against a
    static dimension (the canonical lookup-enrichment shape: the dim is
    broadcast per microbatch, no state store involved, so it scales as
    a stateless map stage)."""
    from pyspark.sql import functions as F
    from medallion_delta_lake_spark.plans.registry import table as _t

    sdf = se.read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type",
        (F.col("user_id") % 1500).alias("c_custkey"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = sdf.join(F.broadcast(cust), "c_custkey").select(
        "event_id", "user_id", "event_type", "c_mktsegment"
    )
    return se.run_available_now(joined, "append", spark)


@query(
    "stream-cusum-monitor",
    # single-file source → one availableNow microbatch → the update
    # emission IS the final statistic; integer-cents state makes it
    # equal the batch closed form exactly (all-BIGINT SQL: no decimal
    # promotion anywhere)
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(round(value * 100, 0) AS BIGINT) - 500) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS pfx
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT user_id,
             pfx - least(0, MIN(pfx) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             )) AS exc
      FROM p
    )
    SELECT user_id,
           CAST(greatest(MAX(exc), 0) AS DOUBLE) / 100.0 AS cusum_max,
           COUNT(*) AS n_points
    FROM s GROUP BY user_id
    """,
)
def stream_cusum_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / CUSUM drift alarm — applyInPandasWithState
    maintaining the one-sided change-point statistic per user against
    a fixed $5.00 target, emitted each microbatch (the monitoring twin
    of the batch window-cusum-drift). Four integer-cents longs of
    state per key — exact, so the maintained value equals the batch
    closed form bit-for-bit after ordered arrival
    (streaming/stateful.py:cusum_monitor)."""
    from medallion_delta_lake_spark.streaming import stateful

    sdf = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        stateful.cusum_monitor(sdf, target=5.0), "update", spark,
        num_state_partitions=8,
    )


@query(
    "stream-gap-monitor",
    # integer-microsecond state: the maintained max gap equals the
    # batch LAG closed form exactly; single-event users emit NULL
    oracle="""
    WITH l AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS gap
      FROM events
    )
    SELECT user_id, MAX(gap) AS max_gap_us,
           COUNT(*) AS n_events
    FROM l GROUP BY user_id
    """,
)
def stream_gap_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / feed-liveness (max inter-arrival gap) monitor —
    applyInPandasWithState keeping (last event time, max gap, count)
    per user in integer microseconds: the "source went dark" alarm
    every ingestion pipeline runs. Exact integer state means the
    maintained statistic equals the batch LAG twin bit-for-bit after
    ordered arrival (streaming/stateful.py:gap_monitor)."""
    from medallion_delta_lake_spark.streaming import stateful

    sdf = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        stateful.gap_monitor(sdf), "update", spark,
        num_state_partitions=8,
    )


@query(
    "stream-drift-monitor",
    # single-file source → one availableNow microbatch in complete
    # mode: the maintained per-(hour, bin) counts equal the batch
    # histogram exactly; the TV close is integer cross-multiplication
    # (the streaming twin of drift-total-variation)
    oracle="""
    WITH base AS (
      SELECT ts, CAST(value AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL
    ),
    e AS (
      SELECT MIN(x) AS mn, MAX(x) AS mx FROM base
      WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
    ),
    rb AS (
      SELECT CASE WHEN mx = mn THEN 0
                  ELSE LEAST(9, GREATEST(0,
                    CAST(FLOOR((x - mn) / ((mx - mn) / 10.0)) AS INT)))
             END AS bin
      FROM base, e WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
    ),
    rh AS (SELECT bin, COUNT(*) AS rc FROM rb GROUP BY bin),
    nr AS (SELECT CAST(SUM(rc) AS BIGINT) AS nrefv FROM rh),
    sb AS (
      SELECT date_trunc('hour', ts) AS w,
             CASE WHEN mx = mn THEN 0
                  ELSE LEAST(9, GREATEST(0,
                    CAST(FLOOR((x - mn) / ((mx - mn) / 10.0)) AS INT)))
             END AS bin
      FROM base, e
    ),
    sc AS (SELECT w, bin, COUNT(*) AS n FROM sb GROUP BY w, bin),
    grid AS (
      SELECT w, CAST(b.bin AS INT) AS bin
      FROM (SELECT DISTINCT w FROM sc),
           (SELECT unnest(generate_series(0, 9)) AS bin) b
    ),
    g AS (
      SELECT grid.w, grid.bin,
             COALESCE(sc.n, 0) AS n, COALESCE(rh.rc, 0) AS rc
      FROM grid
      LEFT JOIN sc ON grid.w = sc.w AND grid.bin = sc.bin
      LEFT JOIN rh ON grid.bin = rh.bin
    ),
    t AS (SELECT w, CAST(SUM(n) AS BIGINT) AS nw FROM g GROUP BY w)
    SELECT g.w AS window_start, t.nw AS n_events,
           CAST(SUM(abs(CAST(g.n AS DECIMAL(19,0)) * nrefv
                        - CAST(g.rc AS DECIMAL(19,0)) * t.nw))
                AS DOUBLE)
             / (2.0 * CAST(t.nw AS DOUBLE) * CAST(nrefv AS DOUBLE))
             AS tv_distance
    FROM g JOIN t ON g.w = t.w, nr
    GROUP BY g.w, t.nw, nrefv
    """,
)
def stream_drift_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / per-hour ingest drift monitor — the incremental twin
    of drift-total-variation: each hourly window's value histogram is
    maintained by the stream (one stateful windowed count over bins
    frozen to the batch reference min/max) and scored against the
    reference distribution with the same integer-exact TV close. The
    reference edges ship as two literals (in production: a broadcast
    config snapshot); the post-stream close runs over the tiny
    (hours × 10 bins) grid so zero-count bins still contribute their
    reference mass."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.plans.registry import table as _t

    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    edges = (
        ev.filter(F.col("ts") < split)
        .agg(
            F.min(F.col("value").cast("double")).alias("mn"),
            F.max(F.col("value").cast("double")).alias("mx"),
        )
        .first()
    )
    mn, mx = edges["mn"], edges["mx"]

    def bin_expr(x: F.Column) -> F.Column:
        raw = F.floor(
            (x - F.lit(mn)) / ((F.lit(mx) - F.lit(mn)) / F.lit(10.0))
        ).cast("int")
        return (
            F.when(F.lit(mx) == F.lit(mn), F.lit(0))
            .otherwise(F.least(F.lit(9), F.greatest(F.lit(0), raw)))
            .alias("bin")
        )

    # reference histogram (batch, 10 rows)
    rh = (
        ev.filter(F.col("ts") < split)
        .select(bin_expr(F.col("value").cast("double")))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("rc"))
    )
    nref = rh.agg(F.sum("rc").cast("bigint").alias("nrefv")).first()[
        "nrefv"
    ]

    # the streaming half: hourly histogram maintenance
    sdf = se.read_events_stream(spark, sf_dir).filter(
        F.col("value").isNotNull()
    )
    binned = sdf.select(
        F.col("ts"), bin_expr(F.col("value").cast("double"))
    )
    agg = binned.groupBy(F.window("ts", "1 hour"), "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    got = se.run_available_now(
        agg, "complete", spark, num_state_partitions=8
    ).select(
        F.col("window.start").alias("w"),
        F.col("bin").cast("int").alias("bin"),
        "n",
    )

    # post-stream close over the tiny (hours × bins) grid
    grid = (
        got.select("w")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(10).select(F.col("id").cast("int").alias("bin"))
            )
        )
    )
    g = (
        grid.join(got, ["w", "bin"], "left")
        .join(F.broadcast(rh), ["bin"], "left")
        .select(
            "w",
            "bin",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("rc"), F.lit(0)).alias("rc"),
        )
    )
    wt = W.partitionBy("w")
    dec = "decimal(19,0)"
    g2 = g.select(
        "w",
        F.sum("n").over(wt).cast("bigint").alias("nw"),
        F.abs(
            F.col("n").cast(dec) * F.lit(nref)
            - F.col("rc").cast(dec) * F.sum("n").over(wt).cast("bigint")
        ).alias("dev"),
    )
    return g2.groupBy("w", "nw").agg(
        (
            F.sum("dev").cast("double")
            / (
                F.lit(2.0)
                * F.col("nw").cast("double")
                * F.lit(nref).cast("double")
            )
        ).alias("tv_distance")
    ).select(
        F.col("w").alias("window_start"),
        F.col("nw").alias("n_events"),
        "tv_distance",
    )


@query(
    "stream-holt-monitor",
    # single-file source -> one availableNow microbatch -> the update
    # emission IS the final smoothing state; the recursive-CTE oracle
    # spells the identical IEEE recurrence over the same per-key order
    oracle="""
    WITH RECURSIVE h AS (
      SELECT user_id, CAST(value AS DOUBLE) AS x,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS BIGINT) AS rn
      FROM events WHERE value IS NOT NULL
    ),
    rec AS (
      SELECT user_id, rn, x AS "level", CAST(0.0 AS DOUBLE) AS trend
      FROM h WHERE rn = 1
      UNION ALL
      SELECT h.user_id, h.rn,
             0.5 * h.x + 0.5 * (rec."level" + rec.trend),
             0.5 * ((0.5 * h.x + 0.5 * (rec."level" + rec.trend))
                    - rec."level") + 0.5 * rec.trend
      FROM rec JOIN h
        ON h.user_id = rec.user_id AND h.rn = rec.rn + 1
    ),
    last AS (SELECT user_id, MAX(rn) AS n_obs FROM h GROUP BY user_id)
    SELECT r.user_id, l.n_obs, r."level", r.trend
    FROM rec r JOIN last l
      ON r.user_id = l.user_id AND r.rn = l.n_obs
    """,
)
def stream_holt_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming / Holt level+trend forecast state per user —
    applyInPandasWithState maintaining the double-exponential
    smoothing recursion incrementally (streaming/stateful.py:
    holt_monitor); after the availableNow run the maintained state
    equals the batch recursion (ts-holt-linear's sequential twin over
    the raw per-event series) bit-for-bit."""
    from medallion_delta_lake_spark.streaming import stateful

    sdf = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        stateful.holt_monitor(sdf), "update", spark,
        num_state_partitions=8,
    )
