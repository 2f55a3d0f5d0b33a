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


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_epoch_col: str,
    id_col: str,
    val_col: str,
    step_s: int = 3600,
) -> DataFrame:
    """Time-series resampling with forward fill: per key, snap
    observations onto a regular ``step_s``-second grid (epoch-second
    buckets, kept as BIGINT so the grid is engine/timezone-exact),
    keep the LAST observation per bucket (latest ``ts``, ties broken
    by ``id_col``), then gap-fill empty buckets with the most recent
    prior value. The grid spans each key's own [min, max] bucket.

    Plan shape: one (key, bucket) aggregation, one per-key grid
    generated from a two-row-per-key min/max agg (``sequence`` +
    ``explode`` — executor-side, never a driver loop), one keyed left
    join, one per-key ordered window for the fill. Each stage shuffles
    on the key — at 100 TB the grid side is tiny (keys × buckets) and
    AQE broadcast-joins it against the observations.

    Output: key cols, ``bucket`` (epoch s), ``value`` (filled),
    ``observed`` (false for gap rows)."""
    keys = list(key_cols)
    bucket = (
        F.floor(F.col(ts_epoch_col) / F.lit(step_s)) * F.lit(step_s)
    ).cast("bigint")
    obs = df.select(
        *keys,
        bucket.alias("bucket"),
        F.col(ts_epoch_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(val_col).alias("_val"),
    )
    last_per_bucket = (
        obs.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*keys, "bucket").orderBy(
                    F.col("_ts").desc(), F.col("_id").desc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(*keys, "bucket", "_val")
    )
    grid = (
        obs.groupBy(*keys)
        .agg(
            F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
        )
        .select(
            *keys,
            F.explode(
                F.sequence("_lo", "_hi", F.lit(step_s).cast("bigint"))
            ).alias("bucket"),
        )
    )
    filled = grid.join(last_per_bucket, [*keys, "bucket"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        *keys,
        "bucket",
        F.last("_val", ignorenulls=True).over(w).alias("value"),
        F.col("_val").isNotNull().alias("observed"),
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    val_col: str,
    n: int = 10,
    threshold: float = 2.0,
) -> DataFrame:
    """Rolling z-score anomaly detection: score each value against the
    mean/std of the PRECEDING ``n`` observations in its key's ordered
    stream (the trailing window excludes the current row, so a spike
    does not mask itself). Emits ``zscore`` (null until ``n`` prior
    points exist or when the window is constant) and ``is_anomaly``
    (|z| > threshold).

    Float determinism: the rolling Σx and Σx² accumulate in
    DECIMAL(38,6) (order-independent), and the closing arithmetic —
    one division, one subtract, one sqrt — is IEEE-exact in any
    engine (sqrt is correctly rounded, unlike log/exp). Plan: one
    shuffle on the key, one sort, one window — the same frame
    computes both sums."""
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-n, -1)
    )
    v = F.col(val_col)
    cnt = F.count(v).over(w)
    s1 = F.sum(v.cast("decimal(38,6)")).over(w).cast("double")
    s2 = F.sum((v * v).cast("decimal(38,6)")).over(w).cast("double")
    mean = s1 / cnt
    var = F.greatest(s2 / cnt - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when(
        (cnt >= n) & (std > 0), (v - mean) / std
    )
    return df.select(
        "*",
        z.alias("zscore"),
        (F.abs(z) > threshold).alias("is_anomaly"),
    )


def ewma_smooth(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    val_col: str,
    alpha: float = 0.25,
    lookback: int = 16,
) -> DataFrame:
    """Exponentially-weighted moving average per key — the classic
    recursive smoother ``ewma = α·x + (1−α)·ewma`` — expressed as a
    sequential fold over the trailing ``lookback`` ordered values
    (collect over a bounded frame + ``F.aggregate``): windows are
    recursion-free in SQL engines, but a bounded-frame fold IS the
    recursion, truncated where the (1−α)^k weight is already ~0
    (0.75¹⁶ ≈ 0.01). The fold is plain double multiply/add in frame
    order — bit-identical to DuckDB's ``list_reduce`` over the same
    frame (the registry's dot-product contract). One shuffle on the
    key, one sort; the array is ≤``lookback`` doubles per row."""
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(lookback - 1), 0)
    )
    vals = F.collect_list(F.col(val_col)).over(w)
    a = float(alpha)
    ewma = F.aggregate(
        F.slice(vals, 2, lookback),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )
    return df.select("*", ewma.alias("ewma"))


def streaks(
    df: DataFrame,
    key_cols: Sequence[str],
    day_col: str,
) -> DataFrame:
    """Consecutive-day activity streaks per key (gaps-and-islands over
    an integer day number): distinct active days minus their per-key
    rank is constant within a run, so grouping on that difference
    yields the islands — all integer arithmetic, no iteration. Output:
    key cols, ``n_active_days``, ``n_streaks``, ``longest_streak``,
    ``current_streak_end`` (the last island's closing day). The
    engagement metric behind every retention dashboard. Two keyed
    shuffles: distinct days, then the island groupBy."""
    keys = list(key_cols)
    days = df.select(*keys, F.col(day_col).alias("_d")).distinct()
    w = Window.partitionBy(*keys).orderBy("_d")
    islands = days.select(
        *keys,
        "_d",
        (F.col("_d") - F.row_number().over(w)).alias("_island"),
    )
    per_island = islands.groupBy(*keys, "_island").agg(
        F.count(F.lit(1)).alias("_len"), F.max("_d").alias("_end")
    )
    return per_island.groupBy(*keys).agg(
        F.sum("_len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("_len").cast("bigint").alias("longest_streak"),
        F.max("_end").cast("bigint").alias("current_streak_end"),
    )


def max_drawdown(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    val_col: str,
) -> DataFrame:
    """Maximum drawdown per key — the largest peak-to-trough drop of
    ``val_col`` along the ordered series (the risk metric behind every
    portfolio/PnL monitor, and the "how far did this counter regress"
    check for monotonic-ish metrics). Running cumulative MAX over the
    ordered frame, per-row drawdown = running_max − value (one exact
    IEEE subtraction — no accumulation, so doubles are engine-stable),
    then one grouped MAX. Output per key: ``max_drawdown``, ``peak``,
    ``n_points``. One shuffle on the key + one sort; ``order_cols``
    must make the ordering total (ties would make running-max
    frame-order-dependent)."""
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = F.max(F.col(val_col)).over(w) - F.col(val_col)
    return (
        df.select(*keys, F.col(val_col).alias("_v"), dd.alias("_dd"))
        .groupBy(*keys)
        .agg(
            F.max("_dd").alias("max_drawdown"),
            F.max("_v").alias("peak"),
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
        )
    )


def cusum_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    val_col: str,
    target,
) -> DataFrame:
    """One-sided CUSUM drift statistic per key — the change-point
    control chart ``S_i = max(0, S_{i-1} + (x_i − target))`` whose
    maximum flags a sustained upward shift from ``target``. The
    recursion has a CLOSED FORM over prefix sums: with
    ``P_i = Σ_{j≤i}(x_j − target)``, ``S_i = P_i − min_{j≤i} P_j`` —
    so two cumulative windows replace the sequential fold. Prefix sums
    accumulate in DECIMAL(38,6) (engine-exact; the subtraction of two
    exact decimals is exact), and ``target`` is any deterministic
    column/literal. Output per key: ``cusum_max`` (the drift
    statistic, ≥0), ``n_points``. One shuffle on the key, one sort."""
    keys = list(key_cols)
    ords = [F.col(c) for c in order_cols]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*ords)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = (F.col(val_col) - target).cast("decimal(38,6)")
    # two projections: window functions cannot nest in one expression;
    # both windows share the (partition, sort), so ONE shuffle + sort
    with_prefix = df.select(
        *keys, *[F.col(c) for c in order_cols], F.sum(dev).over(w).alias("_p")
    )
    # the closed form is S_i = P_i − min_{0≤j≤i} P_j with P_0 = 0, so
    # the running minimum must include the empty prefix's 0 — without
    # it an all-positive run would read as no drift at its first rows
    excursion = F.col("_p") - F.least(
        F.min("_p").over(w), F.lit(0).cast("decimal(38,6)")
    )
    return (
        with_prefix.select(*keys, excursion.alias("_s"))
        .groupBy(*keys)
        .agg(
            F.greatest(F.max("_s"), F.lit(0).cast("decimal(38,6)"))
            .cast("double")
            .alias("cusum_max"),
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
        )
    )


def rolling_slope(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column | str],
    value_col: str,
    window_rows: int = 7,
) -> Column:
    """Rolling OLS trend: the least-squares slope of the value against
    its ROW INDEX over the trailing ``window_rows`` rows per key —
    the windowed "is this metric trending up" primitive (a rolling
    mean tells you level; this tells you direction and rate).

    Closed form from frame sums — slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²) — so it is pure window aggregation: x is the
    row_number (exact integers), y accumulates in DECIMAL(38,6)
    (order-insensitive, engine-exact), and the final combination is a
    handful of IEEE ops on identical inputs. One shuffle on the key;
    NULL until a second row exists (a one-point frame has no slope).

    Returns the slope COLUMN (callers attach it), computed over
    ``Window.partitionBy(key_cols).orderBy(order_by)``."""
    w_ord = Window.partitionBy(*key_cols).orderBy(*_order(order_by, False))
    x = F.row_number().over(w_ord)
    y = F.col(value_col).cast("decimal(38,6)")
    frame = w_ord.rowsBetween(-(window_rows - 1), 0)
    n = F.count(F.lit(1)).over(frame).cast("double")
    sx = F.sum(x).over(frame).cast("double")
    sy = F.sum(y).over(frame).cast("double")
    sxy = F.sum(y * x).over(frame).cast("double")
    sxx = F.sum(x * x).over(frame).cast("double")
    denom = n * sxx - sx * sx
    return F.when(denom != 0, (n * sxy - sx * sy) / denom)


def regime_segments(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column | str],
    regime: Column,
    ts_col: str,
) -> DataFrame:
    """Segment each key's ordered series into maximal runs of a
    boolean ``regime`` expression (above/below threshold, on/off,
    healthy/degraded) — the gaps-and-islands primitive behind uptime
    reports, alert episodes, and drawdown spells. Output: one row per
    (key, segment) with the regime flag, row count, and start/end
    timestamps.

    Classic two-window formulation: a LAG comparison marks regime
    flips, a running SUM of flip marks numbers the segments, then one
    grouped aggregate per segment — two key-partitioned window passes
    plus a groupBy, all on narrow columns; deterministic under the
    caller's explicit tie-breaking order."""
    w = Window.partitionBy(*key_cols).orderBy(*_order(order_by, False))
    prev = F.lag(regime).over(w)
    # two selects: a window function (LAG) cannot nest inside the
    # running SUM's frame, so the flip mark materializes first
    flagged = df.withColumn(
        "_regime", regime
    ).withColumn(
        "_flip",
        F.when(prev.isNull() | (prev != regime), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    seg = flagged.withColumn("segment", F.sum("_flip").over(w))
    return seg.groupBy(*key_cols, "segment").agg(
        F.first("_regime").alias("regime"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )


def rolling_autocorr(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column | str],
    value_col: str,
    window_rows: int = 20,
    min_pairs: int = 5,
) -> DataFrame:
    """Rolling lag-1 autocorrelation per key — the windowed "has this
    series gone momentum/mean-reverting" monitor (stats-autocorr-lag1
    gives one number per key; this tracks HOW the serial dependence
    evolves). Pearson over the trailing ``window_rows`` (x, lag-x)
    pairs via the closed form from frame sums.

    Exactness: rows with NULL values are dropped first (the observed
    series), the per-row products cast to DECIMAL(38,6) — exact for
    2-decimal inputs, and the FRAME bounds the accumulated magnitude
    (≤ window_rows·max²·10⁶ ≪ 2⁵³), so the decimal→double casts stay
    in the cross-engine-exact zone at ANY table size, unlike whole-
    table power sums. The close is IEEE ops + two correctly-rounded
    sqrts; degenerate frames (under ``min_pairs`` pairs or zero
    variance) return NULL via explicit guards — never engine-specific
    0/0 behavior.

    Scale shape: one shuffle on the key, one sort per partition,
    six frame aggregates sharing that single sort.

    Output: ``key_cols + order cols + (n_pairs, roll_autocorr)``.
    """
    w_ord = Window.partitionBy(*key_cols).orderBy(
        *_order(order_by, False)
    )
    vx = F.col(value_col)
    base = df.filter(vx.isNotNull()).withColumn(
        "_y", F.lag(vx).over(w_ord)
    )
    frame = w_ord.rowsBetween(-(window_rows - 1), 0)
    vy = F.col("_y")
    dec = "decimal(38,6)"
    n = F.count(vy).over(frame)
    sx = F.sum(
        F.when(vy.isNotNull(), vx.cast(dec))
    ).over(frame).cast("double")
    sy = F.sum(vy.cast(dec)).over(frame).cast("double")
    sxy = F.sum((vx * vy).cast(dec)).over(frame).cast("double")
    sxx = F.sum(
        F.when(vy.isNotNull(), (vx * vx).cast(dec))
    ).over(frame).cast("double")
    syy = F.sum((vy * vy).cast(dec)).over(frame).cast("double")
    n_d = n.cast("double")
    varx = n_d * sxx - sx * sx
    vary = n_d * syy - sy * sy
    corr = F.when(
        (n >= min_pairs) & (varx > 0) & (vary > 0),
        (n_d * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary)),
    )
    keep = [*key_cols, *[c for c in order_by if isinstance(c, str)]]
    return base.select(
        *keep,
        n.cast("bigint").alias("n_pairs"),
        corr.alias("roll_autocorr"),
    )
