"""Join operators (SURVEY.md §2.3).

All reference joins are left equi-joins; the as-of flavor rides on
engineered availability columns (see derive.py). The one non-relational
reference join — driver-side geodesic nearest-neighbor
(silver_table_creation.py:246-278, quirk Q2) — is rebuilt here as a
fully distributed plan: broadcast the (small) labeled side, cross-join,
score with a native haversine expression, keep rank-1 per left row via
a window. No collect(), no Python loop, scales with executors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.geo import haversine_km


def join_left_using(
    df: DataFrame, other: DataFrame, on: Sequence[str], broadcast_right: bool = False
) -> DataFrame:
    """Left equi-join on shared column names.

    ``broadcast_right=True`` pins a broadcast-hash join for known-small
    dimensions (station maps, daily price feeds) instead of trusting the
    size estimate — at 100 TB a mis-planned sort-merge join against a
    3 KB dimension is the classic avoidable shuffle.
    """
    right = F.broadcast(other) if broadcast_right else other
    return df.join(right, on=list(on), how="left")


def join_left_on(
    df: DataFrame,
    other: DataFrame,
    cond: Column | Sequence[Column],
    broadcast_right: bool = False,
) -> DataFrame:
    """Left join on arbitrary column conditions (multi-key compound equality)."""
    if isinstance(cond, (list, tuple)):
        combined = cond[0]
        for c in cond[1:]:
            combined = combined & c
        cond = combined
    right = F.broadcast(other) if broadcast_right else other
    return df.join(right, on=cond, how="left")


def join_asof_eq(
    fact: DataFrame,
    feed: DataFrame,
    fact_ts: str,
    feed_available_ts: str,
    extra_on: Sequence[str] = (),
    broadcast_feed: bool = False,
) -> DataFrame:
    """Availability-time alignment: fact.ts == feed.available_ts (+ extra keys).

    The reference's point-in-time join (gold_table_creation.py:68):
    because feed delays are exact, as-of degenerates to an equi-join on
    the engineered availability column — O(shuffle) instead of a true
    range join.
    """
    cond = fact[fact_ts] == feed[feed_available_ts]
    for k in extra_on:
        cond = cond & (fact[k] == feed[k])
    right = F.broadcast(feed) if broadcast_feed else feed
    return fact.join(right, on=cond, how="left")


def nn_assign(
    unlabeled: DataFrame,
    labeled: DataFrame,
    distance: Column,
    id_cols: Sequence[str],
    label_cols: Sequence[str],
    tie_break: Sequence[str] = (),
    distance_col: str | None = None,
    fan_out: int | None = None,
) -> DataFrame:
    """Nearest-neighbor label assignment, distributed.

    For each ``unlabeled`` row, attach the ``label_cols`` of the
    ``labeled`` row minimizing ``distance`` (a Column over the joined
    frame). ``tie_break`` (labeled-side column names) makes the winner
    deterministic when distances tie.

    Plan: broadcast nested-loop join (labeled side must be the small
    side) → ``min(struct(sort_dist, tie, labels))`` grouped by
    ``id_cols``. The struct-min is an ordinary aggregate, so Spark
    applies map-side partial aggregation: each task reduces its
    |labeled| candidates per row locally and the shuffle carries ONE
    row per unlabeled row — unlike a window rank-1, which must
    shuffle + sort the full |unlabeled| × |labeled| cross product.
    (Measured 15× faster at sf0.1; the gap widens with cluster size.)

    ``id_cols`` must uniquely identify ``unlabeled`` rows (they are the
    group key; the remaining unlabeled columns ride along as
    ``first()``, which is deterministic exactly because the key is
    unique). Rows are never collapsed: output cardinality ==
    ``unlabeled`` cardinality whenever the uniqueness contract holds.

    NULL distances rank LAST (sort key is ``coalesce(dist, +inf)``), so
    a labeled row whose distance expression is NULL (e.g. NULL
    coordinates) can only win when every candidate is NULL — matching
    ``ROW_NUMBER() ... ORDER BY dist ASC NULLS LAST`` semantics; the
    reported ``distance_col`` keeps the real (possibly NULL) distance.
    """
    # A small unlabeled side may arrive as one scan partition (one file);
    # the cross product then runs in a single task. fan_out spreads the
    # probe side before the broadcast join — a cheap narrow-row shuffle
    # that buys |fan_out|-way parallelism on the NLJ + aggregation.
    if fan_out:
        unlabeled = unlabeled.repartition(fan_out)
    joined = unlabeled.crossJoin(F.broadcast(labeled))
    tie = [c for c in tie_break]
    rest = [c for c in label_cols if c not in tie]
    carry = [c for c in unlabeled.columns if c not in id_cols]
    sort_dist = F.coalesce(distance.cast("double"), F.lit(float("inf")))
    best = joined.groupBy(*[F.col(c) for c in id_cols]).agg(
        F.min(
            F.struct(
                sort_dist.alias("_sd"),
                *[F.col(c) for c in tie],
                *[F.col(c) for c in rest],
                distance.alias("_d"),
            )
        ).alias("_m"),
        *[F.first(F.col(c)).alias(c) for c in carry],
    )
    out_cols = [F.col(c) for c in unlabeled.columns] + [
        F.col(f"_m.{c}").alias(c) for c in label_cols
    ]
    if distance_col:
        out_cols.append(F.col("_m._d").alias(distance_col))
    return best.select(*out_cols)


def nn_assign_spatial(
    unlabeled: DataFrame,
    labeled: DataFrame,
    label_cols: Sequence[str],
    id_cols: Sequence[str],
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Reference k-NN county assignment (silver_table_creation.py:246-287),
    as a plan: haversine scoring + rank-1 window. ``labeled`` must carry
    ``lat_col``/``lon_col`` renamed with a ``_lab`` suffix to avoid
    ambiguity; this helper does the rename itself.
    """
    lab = labeled.select(
        F.col(lat_col).alias("_lab_lat"),
        F.col(lon_col).alias("_lab_lon"),
        *[F.col(c) for c in label_cols],
    )
    dist = haversine_km(F.col(lat_col), F.col(lon_col), F.col("_lab_lat"), F.col("_lab_lon"))
    out = nn_assign(
        unlabeled,
        lab,
        dist,
        id_cols=id_cols,
        label_cols=label_cols,
        tie_break=["_lab_lat", "_lab_lon"],
    )
    return out.drop("_lab_lat", "_lab_lon")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    wide_threshold: int = 32,
) -> DataFrame:
    """True as-of join: each left row gets the payload of the *latest*
    right row with right_ts <= left_ts on the same key (merge-asof /
    point-in-time join, backward direction).

    Scalable union-window formulation: instead of a range join (which
    explodes into an inequality nested loop at scale), tag both inputs,
    union them, and carry the last non-null payload forward over a
    (key)-partitioned, (time, side)-ordered window — right rows sort
    before left rows at equal timestamps, giving <= semantics. Linear
    in rows, no range explosion; this is the plan a 100 TB backfill
    wants. Right side must be unique per (key, right_ts) — pre-dedup
    with latest_per_key otherwise.

    Two physical shapes, chosen by the width of the carried left
    columns (``wide_threshold`` passthrough columns or more = wide):

    - **inline** (narrow fact): left rows ride through the union window
      with their passthrough columns — one shuffle total, no second
      join. Optimal when the rows are cheap to sort.
    - **probe** (wide fact): only the DISTINCT (keys, ts) probe points
      go through the union window's partition-sort, so the sort (the
      spill-prone step on a wide fact) touches (key, ts, payload) rows
      only; the resolved payload then reattaches with a null-safe
      equi-join on (keys, ts) that AQE plans as a hash join — the wide
      rows are never sorted. Duplicate left (key, ts) rows resolve
      once and fan back out in the join.

    Both shapes are semantically identical (tests force each).

    Measured (local[32], 2M-row fact, 100k right states): inline wins
    even at 24 int or 6×240-char passthrough columns (1.0–1.1 s vs
    1.6–2.1 s) — an in-memory sort of wide rows is cheaper than the
    probe's extra distinct + reattach join. The probe shape is the
    SPILL regime's insurance: choose it (low ``wide_threshold``) when
    rows × width exceeds executor sort memory, where a wide external
    sort turns into disk I/O but the narrow probe sort stays in RAM.
    Hence the high default — inline unless the fact is truly wide.
    """
    keys = list(keys)
    passthrough = [c for c in left.columns if c not in keys and c != left_ts]
    if len(passthrough) < wide_threshold:
        return _asof_join_inline(
            left, right, keys, left_ts, right_ts, payload_cols, passthrough
        )
    return _asof_join_probe(
        left, right, keys, left_ts, right_ts, payload_cols
    )


def _asof_join_inline(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    passthrough: list[str],
) -> DataFrame:
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in passthrough],
        *[F.lit(None).cast(rtypes[p]).alias(p) for p in payload_cols],
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in passthrough],
        *[F.col(p) for p in payload_cols],
    )
    u = l2.unionByName(r2)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *keys,
        "_t",
        "_side",
        *passthrough,
        *[
            F.last(F.col(p), ignorenulls=True).over(w).alias(p)
            for p in payload_cols
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .drop("_side")
        .withColumnRenamed("_t", left_ts)
    )


def _asof_join_probe(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    rtypes = dict(right.dtypes)
    probe = left.select(
        *[F.col(k) for k in keys], F.col(left_ts).alias("_t")
    ).distinct()
    l2 = probe.select(
        *keys,
        "_t",
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rtypes[p]).alias(p) for p in payload_cols],
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(p) for p in payload_cols],
    )
    u = l2.unionByName(r2)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        u.select(
            *keys,
            "_t",
            "_side",
            *[
                F.last(F.col(p), ignorenulls=True).over(w).alias(p)
                for p in payload_cols
            ],
        )
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(k).alias(f"_ak_{k}") for k in keys],
            F.col("_t").alias("_at"),
            *payload_cols,
        )
    )
    cond = left[left_ts].eqNullSafe(F.col("_at"))
    for k in keys:
        cond = cond & left[k].eqNullSafe(F.col(f"_ak_{k}"))
    return left.join(carried, on=cond, how="left").drop(
        "_at", *[f"_ak_{k}" for k in keys]
    )


def range_join_bands(
    df: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Band/range join: attach the band whose [lo, hi) interval contains
    ``value_col``. The bands side is broadcast (it is a dimension); the
    fact side never shuffles — a broadcast nested-loop with a range
    predicate, which Catalyst turns into a tight codegen loop. For
    non-broadcastable interval sets, pre-bucket both sides on
    floor(value/width) to recover an equi-join."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    return df.join(F.broadcast(bands), on=cond, how="left")


def join_semi(df: DataFrame, other: DataFrame, cond: Column) -> DataFrame:
    """Left semi join: keep df rows with ≥1 match (EXISTS). No columns
    from the right side, no fan-out — the build side only ships keys."""
    return df.join(other, on=cond, how="left_semi")


def join_anti(df: DataFrame, other: DataFrame, cond: Column) -> DataFrame:
    """Left anti join: keep df rows with no match (NOT EXISTS)."""
    return df.join(other, on=cond, how="left_anti")


def range_join_bucketed(
    df: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
) -> DataFrame:
    """Range join for interval sets too big to broadcast: both sides
    map to integer buckets of ``bucket_width`` — values to their one
    bucket, intervals exploded to every bucket they span — then meet
    in a bucket EQUI-join with the precise [lo, hi) filter applied
    after. No broadcast, no nested-loop: shuffle is keyed by the
    bucket, and each value only meets intervals overlapping its
    bucket. Intervals spanning b buckets emit b rows (pick
    bucket_width ≈ median interval width so b stays small).

    Results match range_join_bands exactly for non-overlapping OR
    overlapping intervals (a value landing in k intervals emits k
    rows — same as the broadcast variant's join semantics), except
    unmatched left rows are dropped (inner semantics; wrap with a
    left join on the keys to recover them)."""
    vb = df.withColumn(
        "_bucket", F.floor(F.col(value_col) / bucket_width).cast("bigint")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("bigint"),
                # hi is exclusive: the bucket containing hi only hosts
                # the interval if hi is not exactly on its lower edge
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bucket_width
                ).cast("bigint"),
            )
        ),
    )
    return (
        vb.join(ib, "_bucket")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: Sequence[str] = (),
    bucket_width: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join — pair every left interval with every
    right interval it overlaps (half-open semantics:
    ``l_start < r_end AND r_start < l_end``), optionally within equi
    ``on`` keys. Spark has no native interval join; the naive spelling
    is a cross join with an inequality filter (a broadcast nested loop
    that dies at scale), so both sides instead explode onto an integer
    bucket grid of ``bucket_width`` (numeric or epoch-second units) and
    meet in a bucket+keys EQUI-join. A pair overlapping k shared
    buckets would emit k duplicates; it is counted exactly once by
    keeping only the FIRST shared bucket —
    ``max(floor(l_start/w), floor(r_start/w))`` — a pure predicate, no
    distinct, no second shuffle.

    Scale notes: shuffle is keyed by (bucket, keys); candidates are
    bucket-local, so work is Σ_b |L_b|·|R_b| rather than |L|·|R|. Pick
    ``bucket_width`` near the median interval length — intervals
    spanning b buckets emit b rows. ``how="left"`` recovers unmatched
    left intervals with a final keyed anti-union (two narrow columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    w = float(bucket_width)
    keys = list(on)

    def buckets(start: str, end: str) -> Column:
        # half-open end: an interval ending exactly on a bucket edge
        # does not occupy that bucket
        return F.sequence(
            F.floor(F.col(start) / w).cast("bigint"),
            F.greatest(
                F.floor(F.col(start) / w),
                F.ceil(F.col(end) / w) - 1,
            ).cast("bigint"),
        )

    lb = left.withColumn("_bucket", F.explode(buckets(l_start, l_end)))
    rb = right.withColumn("_bucket", F.explode(buckets(r_start, r_end)))
    first_shared = F.greatest(
        F.floor(F.col(l_start) / w), F.floor(F.col(r_start) / w)
    ).cast("bigint")
    joined = (
        lb.join(rb, ["_bucket", *keys])
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
        )
        .filter(F.col("_bucket") == first_shared)
        .drop("_bucket")
    )
    if how == "inner":
        return joined
    matched = joined.select(*keys, l_start, l_end).distinct()
    unmatched = left.join(
        matched, [*keys, l_start, l_end], "left_anti"
    )
    right_cols = [c for c in right.columns if c not in keys]
    for c in right_cols:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return joined.unionByName(unmatched)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    wide_threshold: int = 32,
) -> DataFrame:
    """Forward as-of join: each left row gets the payload of the
    *earliest* right row with ``right_ts >= left_ts`` on the same key
    — the "next event after" lookup (next maintenance slot, next
    price reset), the time-mirror of :func:`asof_join`. Implemented
    BY that mirror: negate both (numeric) time columns and run the
    backward machinery, so the union-window plan, the inline/probe
    dispatch, and the tie semantics (equal timestamps match) are all
    inherited rather than re-derived."""
    neg_l, neg_r = "__neg_lts", "__neg_rts"
    out = asof_join(
        left.withColumn(neg_l, -F.col(left_ts)),
        right.withColumn(neg_r, -F.col(right_ts)).drop(right_ts),
        keys,
        neg_l,
        neg_r,
        payload_cols,
        wide_threshold=wide_threshold,
    )
    return out.drop(neg_l, neg_r)


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tolerance,
    wide_threshold: int = 32,
) -> DataFrame:
    """As-of join with a MAX-STALENESS bound — the feature-store
    point-in-time lookup contract: a match older than ``tolerance``
    (same units as the ts columns) is as good as no match, so its
    payload columns are nulled. A thin layer over :func:`asof_join`:
    the matched right timestamp rides along as one extra carried
    column and a single null-out projection applies the bound — the
    union-window plan (one keyed shuffle, no range join) is untouched.
    ``tolerance`` may be a literal or Column."""
    carry = "_asof_matched_ts"
    r2 = right.withColumn(carry, F.col(right_ts))
    out = asof_join(
        left,
        r2,
        keys=keys,
        left_ts=left_ts,
        right_ts=right_ts,
        payload_cols=list(payload_cols) + [carry],
        wide_threshold=wide_threshold,
    )
    stale = F.col(carry).isNull() | (
        (F.col(left_ts) - F.col(carry)) > tolerance
    )
    return out.select(
        *[
            F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
            if c in payload_cols
            else F.col(c)
            for c in out.columns
            if c != carry
        ]
    )


def bloom_semi_join(
    df: DataFrame,
    other: DataFrame,
    key: str,
    other_key: str | None = None,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Semi join with a BROADCAST BLOOM-FILTER prefilter — the
    pattern that makes a selective semi join cheap at 100 TB: the
    build side's keys fold into an ``n_bits`` bitmap (one grouped
    bit_or per 64-bit word — constant-size regardless of build rows),
    the bitmap broadcasts, and probe rows failing ANY of the
    ``n_hashes`` membership tests drop BEFORE the shuffle the exact
    semi join would otherwise pay on every row. Survivors (true
    matches + bloom false positives) then take the exact left_semi —
    so the RESULT is exactly the semi join; the bloom only cuts
    shuffle volume. Catalyst's runtime row-group filters do a version
    of this inside one query; this operator makes the technique
    available as a reusable, tunable building block (e.g. persisting
    the bitmap across daily runs).

    Hashing is the portable md5-prefix h64 with per-probe salts, so
    tests can rebuild the identical bitmap. False-positive rate ≈
    (1 − e^{−kn/m})^k — at the defaults, <1% up to ~6k build keys."""
    from medallion_delta_lake_spark.functions.hashing import h64

    ok = other_key or key
    n_words = n_bits // 64

    def word_and_bit(col, i: int):
        h = F.pmod(
            h64(F.concat(F.lit(f"{salt}{i}|"), col.cast("string"))),
            F.lit(n_bits),
        )
        return (h / 64).cast("int"), F.pmod(h, F.lit(64)).cast("int")

    # build: n_hashes bit positions per key → OR-folded per 64-bit word
    # (python-side F.shiftleft takes only int literals; the SQL
    # function accepts column shift amounts, so masks go through expr)
    parts = []
    for i in range(n_hashes):
        w, b = word_and_bit(F.col(ok), i)
        parts.append(
            other.select(w.alias("word"), b.alias("_bit")).select(
                "word",
                F.expr("shiftleft(CAST(1 AS BIGINT), _bit)").alias("m"),
            )
        )
    from functools import reduce as _reduce

    bitmap = (
        _reduce(DataFrame.unionAll, parts)
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )
    # probe: every hash's bit must be set; a missing word = not set
    probe = df
    for i in range(n_hashes):
        w, b = word_and_bit(F.col(key), i)
        bm = bitmap.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        probe = (
            probe.withColumn(f"_p{i}", b)
            .join(F.broadcast(bm), w == F.col(f"_w{i}"), "left")
            .filter(
                F.coalesce(
                    F.expr(f"shiftright(_b{i}, _p{i})").bitwiseAND(1),
                    F.lit(0),
                )
                == 1
            )
        )
    probe = probe.drop(
        *[
            c
            for i in range(n_hashes)
            for c in (f"_w{i}", f"_b{i}", f"_p{i}")
        ]
    )
    # exact verification: false positives die here
    return probe.join(
        other.select(F.col(ok).alias(key)).distinct(),
        key,
        "left_semi",
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    feature_cols: list[str] | None = None,
    tolerance_days: int | None = None,
) -> DataFrame:
    """Feature-store point-in-time read: each fact row picks up the
    SCD-2 dimension attributes that were valid AS OF its timestamp —
    ``valid_from <= ts < valid_to`` (open ``valid_to`` = current row)
    — with an optional staleness tolerance: a feature last updated
    more than ``tolerance_days`` before the fact is masked to NULL and
    flagged ``is_stale`` (the training-serving-skew guard every
    feature platform enforces).

    SCD-2 intervals are disjoint per key, so the interval predicate
    matches at most one dimension row per fact — the join stays 1:≤1.
    Physically this is an equi-join on ``key`` with the interval as a
    post-join filter: one shuffle keyed on the entity id, no range
    explosion, broadcastable when the dimension is small. Appended
    columns: ``matched`` (a validity interval covered ts),
    ``days_since_update`` (NULL when unmatched), ``is_stale``, and the
    (masked) ``feature_cols``."""
    feature_cols = list(feature_cols or [])
    d = dim.select(
        F.col(key).alias("_pit_key"),
        F.col(valid_from).alias("_pit_from"),
        F.col(valid_to).alias("_pit_to"),
        *[F.col(c) for c in feature_cols],
    )
    cond = (
        (facts[key] == d["_pit_key"])
        & (d["_pit_from"] <= facts[ts_col])
        & (d["_pit_to"].isNull() | (facts[ts_col] < d["_pit_to"]))
    )
    j = facts.join(d, cond, "left")
    matched = F.col("_pit_key").isNotNull()
    age = F.datediff(F.col(ts_col), F.col("_pit_from"))
    if tolerance_days is None:
        stale = F.when(matched, F.lit(False))
    else:
        stale = F.when(matched, age > F.lit(tolerance_days))
    fresh = matched & ~F.coalesce(stale, F.lit(False))
    out_feats = [
        F.when(fresh, F.col(c)).alias(c) for c in feature_cols
    ]
    return j.select(
        *[facts[c] for c in facts.columns],
        matched.alias("matched"),
        F.when(matched, age).alias("days_since_update"),
        stale.alias("is_stale"),
        *out_feats,
    )
