"""Core relational query surface (SURVEY.md §2.1–§2.10) over the driver
testdata, each paired with its DuckDB oracle.

Op-ids follow SURVEY.md §2. Each query exercises the engine operator
modules (clean/derive/joins/agg/window/upsert), not ad-hoc DataFrame
code, so the oracle checks the operators users would actually call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import clean, derive, joins, upsert, window
from medallion_delta_lake_spark.plans.registry import query, table


def dsum(col, alias: str):
    """Order/engine-independent SUM over doubles (see registry docstring)."""
    c = F.expr(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,6)")).cast("double").alias(alias)


def davg(col, alias: str):
    """AVG as exact-decimal SUM / COUNT — deterministic across engines."""
    c = F.expr(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast("decimal(38,6)")).cast("double") / F.count(c)
    ).alias(alias)


def _dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def _davg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# ---------------------------------------------------------------- flagship

Q1_CUTOFF = "1998-09-02 00:00:00"


@query(
    "q1-pricing-summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity', 'sum_qty')},
           {_dsum_sql('l_extendedprice', 'sum_base_price')},
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {_davg_sql('l_quantity', 'avg_qty')},
           {_davg_sql('l_extendedprice', 'avg_price')},
           {_davg_sql('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary (scan→filter→agg).

    The filter reaches the parquet scan (PushedFilters), projection is
    pruned to 7 columns, and the aggregation is partial+final hash agg —
    the shuffle carries ≤ (groups × partitions) rows.
    """
    li = table(spark, sf_dir, "lineitem")
    li = li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg(F.col("l_quantity"), "avg_qty"),
        davg(F.col("l_extendedprice"), "avg_price"),
        davg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ------------------------------------------------------- filters / projects


@query(
    "filter-neq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity <> 12.0
    """,
)
def filter_neq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-neq — sentinel removal (ref: county != 12,
    silver_table_creation.py:39)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return clean.filter_neq(li, "l_quantity", 12.0)


@query(
    "filter-neq-chain",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem WHERE l_linenumber NOT IN (1, 2)
    """,
)
def filter_not_in_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-neq-chain — drop early batches (ref: data_block_id not in
    (0,1), gold_table_creation.py:47)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    return clean.filter_not_in(li, "l_linenumber", [1, 2])


@query(
    "filter-range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 23 AND l_quantity < 48
    """,
)
def filter_range_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-range — open-interval predicate (ref: hours_ahead > 23 AND
    < 48, gold_table_creation.py:126)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return clean.filter_range(li, "l_quantity", 23, 48)


@query(
    "filter-isnull",
    oracle="""
    SELECT event_id, user_id
    FROM (SELECT event_id, user_id,
                 CASE WHEN value < 50.0 THEN NULL ELSE value END AS v
          FROM events)
    WHERE v IS NULL
    """,
)
def filter_isnull_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-isnull — NULL-key row selection (ref: county_id IS NULL,
    silver_table_creation.py:249)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("value") < 50.0, F.lit(None)).otherwise(F.col("value"))
    )
    return clean.filter_isnull(ev, "v").select("event_id", "user_id")


@query(
    "project-select-expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_quantity * 2.0 AS double_qty
    FROM lineitem
    """,
)
def project_select_expr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """project-select-expr — expression projection with aliases (ref:
    selectExpr at silver_table_creation.py:243,252,290)."""
    return table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice * (1 - l_discount) AS disc_price",
        "l_quantity * 2.0 AS double_qty",
    )


@query(
    "project-rename-drop",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name, c_mktsegment
    FROM customer
    """,
)
def project_rename_drop_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """project-rename / project-drop — bulk rename as one projection
    (ref: chained withColumnRenamed, gold_table_creation.py:36,65,88;
    drops at :78,92,158)."""
    cust = table(spark, sf_dir, "customer")
    out = derive.rename_columns(
        cust, {"c_custkey": "customer_id", "c_name": "customer_name"}
    )
    return derive.drop_columns(out, ["c_nationkey", "c_acctbal"])


@query(
    "expr-round",
    oracle="""
    SELECT ROUND(l_quantity / 2, 0) AS half_qty, COUNT(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def expr_round_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expr-round — join-key quantization (ref: ROUND(latitude,1),
    silver_table_creation.py:243). Input halves are exactly
    representable so HALF_UP agrees across engines."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("half_qty", F.round(F.col("l_quantity") / 2, 0))
        .groupBy("half_qty")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------------- derivations


@query(
    "derive-interval-add",
    oracle="""
    SELECT event_id, ts, ts + INTERVAL 1 DAY AS available_ts
    FROM events
    """,
)
def derive_interval_add_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """derive-column / expr-interval-add — fixed publication delay (ref:
    electricity_available_datetime = forecast_date + INTERVAL 1 DAY,
    silver_table_creation.py:137)."""
    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    return derive.with_availability(ev, "ts", "1 DAY", "available_ts")


@query(
    "derive-case-hour-avail",
    oracle="""
    SELECT event_id, ts,
           CASE WHEN EXTRACT(hour FROM ts) < 11 THEN ts + INTERVAL 1 DAY
                ELSE ts + INTERVAL 2 DAY END AS available_ts
    FROM events
    """,
)
def derive_case_hour_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expr-case-when-hour — hour-dependent delay (ref: historical
    weather availability, silver_table_creation.py:323-326)."""
    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    return derive.with_availability_by_hour(ev, "ts", "available_ts")


# ------------------------------------------------------------------- joins


@query(
    "join-left-using",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_left_using_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-left-using — left equi-join on shared names, small side
    broadcast (ref: station-map join, silver_table_creation.py:314,414)."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    return joins.join_left_using(orders, cust, ["o_custkey"], broadcast_right=True)


@query(
    "join-left-multi-eq",
    oracle="""
    WITH g AS (
      SELECT l_orderkey AS g_orderkey, l_returnflag AS g_returnflag,
             COUNT(*) AS flag_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS flag_qty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, g.flag_lines, g.flag_qty
    FROM lineitem l
    LEFT JOIN g ON l.l_orderkey = g.g_orderkey AND l.l_returnflag = g.g_returnflag
    """,
)
def join_left_multi_eq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-left-multi-eq — compound-key left join (ref: 4-column
    train⋈client join, gold_table_creation.py:39)."""
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_orderkey").alias("g_orderkey"),
        F.col("l_returnflag").alias("g_returnflag"),
    ).agg(
        F.count(F.lit(1)).alias("flag_lines"),
        dsum(F.col("l_quantity"), "flag_qty"),
    )
    out = joins.join_left_on(
        li.select("l_orderkey", "l_linenumber", "l_returnflag"),
        g,
        [
            F.col("l_orderkey") == F.col("g_orderkey"),
            F.col("l_returnflag") == F.col("g_returnflag"),
        ],
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "flag_lines", "flag_qty"
    )


@query(
    "join-left-asof-eq",
    oracle="""
    WITH daily AS (
      SELECT DATE_TRUNC('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS day_value,
             COUNT(*) AS day_events
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.ts, d.day_value, d.day_events
    FROM (SELECT event_id, ts,
                 DATE_TRUNC('day', ts) + INTERVAL 1 DAY AS available_day
          FROM events) e
    LEFT JOIN daily d ON e.available_day = d.day
    """,
)
def join_asof_eq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-left-asof-eq — availability-time alignment: each event joins
    the previous day's aggregate through an engineered availability
    column (ref: gold_table_creation.py:68; derivation
    silver_table_creation.py:137). Point-in-time join as pure equi-join."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        dsum(F.col("value"), "day_value"),
        F.count(F.lit(1)).alias("day_events"),
    )
    fact = ev.select(
        "event_id",
        "ts",
        (F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 1 DAY")).alias(
            "available_day"
        ),
    )
    out = joins.join_asof_eq(
        fact, daily, "available_day", "day", broadcast_feed=True
    )
    return out.select("event_id", "ts", "day_value", "day_events")


@query(
    "nn-assign",
    oracle="""
    SELECT c_custkey, nearest_suppkey, nn_dist FROM (
      SELECT c.c_custkey, s.s_suppkey AS nearest_suppkey,
             ABS(c.c_acctbal - s.s_acctbal) AS nn_dist,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_custkey
               ORDER BY ABS(c.c_acctbal - s.s_acctbal) ASC, s.s_suppkey ASC
             ) AS rn
      FROM customer c CROSS JOIN supplier s
    ) WHERE rn = 1
    """,
)
def nn_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nn-spatial — nearest-neighbor assignment as broadcast cross-join +
    rank-1 window (replaces the reference's driver-side geodesic loop,
    silver_table_creation.py:246-278, quirk Q2). 1-D account-balance
    distance here; the haversine variant is nn_assign_spatial (tested in
    tests/test_joins.py against fixture coordinates)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("nearest_suppkey"),
        F.col("s_acctbal").alias("_s_bal"),
    )
    dist = F.abs(F.col("c_acctbal") - F.col("_s_bal"))
    out = joins.nn_assign(
        cust,
        supp,
        dist,
        id_cols=["c_custkey"],
        label_cols=["nearest_suppkey"],
        tie_break=["nearest_suppkey"],
        distance_col="nn_dist",
        fan_out=spark.sparkContext.defaultParallelism,
    )
    return out.select("c_custkey", "nearest_suppkey", "nn_dist")


# ------------------------------------------------------------ aggregations


@query(
    "agg-avg-groupby-dynamic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_davg_sql('l_quantity', 'l_quantity')},
           {_davg_sql('l_extendedprice', 'l_extendedprice')},
           {_davg_sql('l_discount', 'l_discount')},
           {_davg_sql('l_tax', 'l_tax')}
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_avg_dynamic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg-avg-groupby-dynamic — group by keys, average every measure
    column, schema-driven (ref SQL templating over df.columns,
    silver_table_creation.py:347-361). Uses the engine's deterministic
    davg rather than float avg so the oracle hash is exact."""
    li = table(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    # avg_groupby_dynamic is the float-path operator; the oracle query
    # uses the decimal-deterministic variant with identical semantics.
    return li.groupBy(*keys).agg(*[davg(F.col(c), c) for c in measures])


@query(
    "agg-count-distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_rows
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count-diagnostic — exact grouped distinct (ref: distinct
    prediction-unit checks, gold_table_creation.py:59-60)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "approx-distinct",
    # The HLL++ estimate itself is engine-specific, so the oracle
    # checks the sketch's published error bound instead: the query
    # emits the exact count plus a within_bound flag (|approx−exact| ≤
    # 3×rsd×exact, rsd = 0.05 default), which must be TRUE everywhere.
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx-distinct — HyperLogLog++ distinct users per event type; the
    scale path of agg-count-distinct (no exact-distinct shuffle). The
    correctness query self-checks the estimate against the exact count
    within 3× the sketch's relative standard deviation."""
    ev = table(spark, sf_dir, "events")
    agged = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("_approx"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    return agged.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("_approx") - F.col("n_users_exact"))
            <= 3 * 0.05 * F.col("n_users_exact")
        ).alias("within_bound"),
    )


@query(
    "dedup-full-row",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem
    """,
)
def dedup_full_row_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup-full-row — exact duplicate elimination (ref:
    dropDuplicates() before every merge, silver_table_creation.py:32)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_linenumber"
    )
    return clean.dedup_full_row(li)


@query(
    "dedup-latest-per-key",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latest-per-key — keep newest row per key; the upsert pre-dedup
    primitive (SURVEY.md §7 hard part 1)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return window.latest_per_key(ev, ["user_id"], "ts", tie_break=["event_id"])


# --------------------------------------------------------- sort / limit


@query(
    "sort-limit-topn",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)
def sort_limit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort-multi + limit-show — global top-N (ref:
    gold_table_creation.py:127). Physically a TakeOrderedAndProject:
    per-partition top-25 then driver merge — no global sort shuffle."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return orders.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).limit(25)


# ------------------------------------------------------------------ set ops


@query(
    "set-union",
    oracle="""
    SELECT c_custkey AS party_id, c_name AS party_name, 'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_suppkey AS party_id, s_name AS party_name, 'supplier' AS kind
    FROM supplier
    """,
)
def set_union_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """set-union — name-based union (ref uses positional union,
    silver_table_creation.py:287, quirk Q6; the engine uses unionByName)."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_id"),
        F.col("c_name").alias("party_name"),
        F.lit("customer").alias("kind"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_id"),
        F.col("s_name").alias("party_name"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(supp)


# -------------------------------------------------------------- null ops


_NULLABLE_EVENTS_SQL = """
      SELECT event_id,
             CASE WHEN value < 10.0 THEN NULL ELSE value END AS v,
             CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et
      FROM events
"""


def _nullable_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 10.0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("et"),
    )


@query(
    "dropna-any",
    oracle=f"""
    SELECT event_id, v, et FROM ({_NULLABLE_EVENTS_SQL})
    WHERE v IS NOT NULL AND et IS NOT NULL
    """,
)
def dropna_any_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropna-any — drop rows with any NULL (ref: dropna(how='any'),
    silver_table_creation.py:35 et al.)."""
    return clean.dropna_any(_nullable_events(spark, sf_dir))


@query(
    "null-profile",
    oracle=f"""
    SELECT COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS event_id,
           COUNT(CASE WHEN v IS NULL THEN 1 END) AS v,
           COUNT(CASE WHEN et IS NULL THEN 1 END) AS et
    FROM ({_NULLABLE_EVENTS_SQL})
    """,
)
def null_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """null-profile — per-column null counts in ONE scan (the reference's
    dict-comprehension runs a job per column — quirk Q5,
    silver_table_creation.py:140)."""
    return clean.null_profile(_nullable_events(spark, sf_dir))


# ------------------------------------------------------- windows / upsert


@query(
    "topk-per-group",
    oracle="""
    SELECT user_id, event_id, value, rank FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC
             ) AS rank
      FROM events
    ) WHERE rank <= 3
    """,
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topk-per-group — top-3 events per user by value (extension op;
    single shuffle on the group key)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return window.topk_per_group(
        ev,
        ["user_id"],
        [F.col("value").desc(), F.col("event_id").asc()],
        k=3,
        descending=False,  # orderBy columns already carry direction
    )


@query(
    "window-agg-tumbling",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def window_agg_tumbling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window-agg-tumbling — 1-hour tumbling-window aggregate; the batch
    twin of the streaming plan in streaming/events.py (same logical
    result Structured Streaming maintains incrementally with a
    watermark)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.window(F.col("ts"), "1 hour").getField("start").alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value"), "total_value"),
    )


@query(
    "upsert-merge-state",
    oracle="""
    WITH tgt AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    src AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0)
    SELECT * FROM src
    UNION ALL
    SELECT t.* FROM tgt t
    WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
    """,
)
def upsert_merge_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upsert-* — the generic SCD-1 merge's post-state (SURVEY.md §2.9),
    oracle-checked as source ∪ (target anti-join source). The
    delete-missing / write-path variants are covered by
    tests/test_upsert.py (idempotency, source-snapshot equivalence,
    delete-if-absent) since table mutation is not SQL-oracle-expressible."""
    orders = table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    source = orders.filter(F.col("o_orderkey") % 2 == 0)
    return upsert.merge_state(
        target, source, keys=["o_orderkey"], delete_missing=False
    )


@query(
    "approx-hll-mergeable",
    # the sketch BYTES are engine-specific; the oracle checks the
    # merge algebra's published bound instead: the union of per-source
    # sketches must estimate the GLOBAL distinct count within 3×rsd
    # (lgConfigK=12 → rsd ≈ 1.04/√2¹² ≈ 0.0163), and the flag must be
    # TRUE — the property that makes incremental distinct counting
    # work at all
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_exact,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_sketches,
           TRUE AS within_bound
    FROM events
    """,
)
def approx_hll_mergeable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx / MERGEABLE HLL sketches (Apache DataSketches,
    F.hll_sketch_agg) — the incremental-distinct pattern 100 TB
    pipelines need: each partition/day/source aggregates its OWN
    sketch once, and any rollup is a cheap sketch UNION instead of a
    re-scan of history (approx_count_distinct gives a number you
    cannot merge later). Here: one sketch per event_type, unioned
    into the global distinct-user estimate, self-checked against the
    exact count within 3×rsd — the bound the oracle pins."""
    ev = table(spark, sf_dir, "events")
    per_source = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("_sk")
    )
    unioned = per_source.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("_sk", True)
        ).alias("_est"),
        F.count(F.lit(1)).cast("bigint").alias("n_sketches"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    rsd = 1.04 / (2.0 ** 12) ** 0.5
    return exact.crossJoin(F.broadcast(unioned)).select(
        "n_exact",
        "n_sketches",
        (
            F.abs(F.col("_est") - F.col("n_exact"))
            <= 3 * rsd * F.col("n_exact")
        ).alias("within_bound"),
    )
