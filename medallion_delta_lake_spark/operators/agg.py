"""Aggregation operators (SURVEY.md §2.4).

Reference parity:
- avg_groupby_dynamic ← the SQL-string-templated "group by keys, avg
  everything else" (silver_table_creation.py:347-361;
  gold_table_creation.py:103-116,134-145). The engine expresses it
  directly as groupBy().agg() over a computed column list — no temp
  view, no string templating; Catalyst still plans partial+final
  HashAggregate with map-side combine, so the shuffle carries one row
  per (group, partition), not the raw data.
- profile            ← the commented count/distinct diagnostics
  (silver_table_creation.py:128-133; gold_table_creation.py:60,71,75),
  consolidated into one single-pass aggregation.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def q_div(num: F.Column, den: F.Column, scale: int) -> F.Column:
    """Exact ``trunc(num·10^scale / den)`` as BIGINT, computed entirely
    in DECIMAL(38,0) integer arithmetic — the driver-face quantization
    primitive for statistics whose mathematical value is a ratio of
    exact integers (τ², z², rates, integer-micro means). No double is
    ever formed, so the result is identical in ANY engine/version —
    unlike a ``double ratio → floor(x·10^k)`` chain, which is 1-ulp
    exposed when the two engines' division differs (the r8/r9 driver-red
    signature: rows+schema green, hash red, locally unreproducible).

    Callers keep ``num ≥ 0`` (emit the sign as a separate INT column)
    so trunc == floor; both engines truncate toward zero on integer
    division (verified: Spark ``div`` −7 div 2 = −3, DuckDB ``//``
    −7 // 2 = −3). ``den = 0`` yields NULL (decimal ``%`` NULL-out) —
    guard with CASE in the oracle to match. Quotient must fit BIGINT
    (Spark's ``div`` wraps silently past 2⁶³); every caller's result is
    a ≤ 10^scale-bounded statistic, so this holds by construction.

    DuckDB oracle mirror: ``CAST(num AS HUGEINT) * 10^scale // den``.
    """
    n = num.cast("decimal(38,0)") * F.lit(10**scale).cast(
        "decimal(38,0)"
    )
    d = den.cast("decimal(38,0)")
    return ((n - n % d) / d).cast("long")


def avg_groupby_dynamic(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
    alias_prefix: str = "",
) -> DataFrame:
    """Group by ``keys``; average every other (or given) column.

    ``alias_prefix`` reproduces the reference's ``historical_*`` /
    forecast renames (gold_table_creation.py:105-116) in the same
    projection — no second pass.
    """
    keys = list(keys)
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in keys]
    aggs = [F.avg(c).alias(f"{alias_prefix}{c}") for c in value_cols]
    return df.groupBy(*keys).agg(*aggs)


def agg_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, str],
) -> DataFrame:
    """Generic group-by: ``aggs`` maps output alias → SQL agg expression."""
    exprs = [F.expr(e).alias(a) for a, e in aggs.items()]
    return df.groupBy(*[F.col(k) for k in keys]).agg(*exprs)


def profile(df: DataFrame, distinct_cols: Sequence[str] = ()) -> DataFrame:
    """One-pass table profile: row count + exact distincts for given cols."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in distinct_cols:
        aggs.append(F.countDistinct(F.col(c)).alias(f"n_distinct_{c}"))
    return df.agg(*aggs)


def approx_profile(df: DataFrame, distinct_cols: Sequence[str] = ()) -> DataFrame:
    """Scale path of :func:`profile`: HyperLogLog++ distincts (no exact
    count-distinct shuffle; constant memory per column at 100 TB)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in distinct_cols:
        aggs.append(
            F.approx_count_distinct(F.col(c)).alias(f"approx_distinct_{c}")
        )
    return df.agg(*aggs)


def gini_impurity(
    df: DataFrame,
    group_cols: Sequence[str],
    class_col: str,
) -> DataFrame:
    """Per-group Gini impurity of a categorical column:
    ``1 - Σ_c (n_c / n)²`` — the class-diversity measure (0 = one
    class, →1 = uniform over many). Chosen over Shannon entropy for
    the oracle-exactness contract: Gini is pure rational arithmetic
    (integer counts, one IEEE division and multiply per class —
    bit-identical in any engine), where entropy's log() differs at the
    last ulp across libm implementations.

    Kept integral to the last step: ``1 - Σn_c²/n²`` — the sums are
    exact BIGINTs, the single closing division is one IEEE op. Two
    partial-aggregating shuffles on (group, class) then (group):
    map-side combine keeps shuffle rows at one per distinct pair per
    partition; nothing driver-side. Output: group cols, ``n`` (rows),
    ``n_classes``, ``gini``."""
    counts = df.groupBy(*group_cols, class_col).agg(
        F.count(F.lit(1)).alias("_n_c")
    )
    return counts.groupBy(*group_cols).agg(
        F.sum("_n_c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        (
            F.lit(1.0)
            - F.sum(F.col("_n_c") * F.col("_n_c")).cast("double")
            / (
                F.sum("_n_c").cast("double")
                * F.sum("_n_c").cast("double")
            )
        ).alias("gini"),
    )


def mode_exact(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Exact per-group mode with a DETERMINISTIC tie-break (highest
    count, then smallest value) — unlike ``F.mode``, whose tie winner
    is partition-order-dependent and therefore irreproducible across
    engines/runs. Output: group cols, ``mode_value``, ``mode_count``.

    Plan: one (group, value) partial-aggregated count, one window
    rank over the (far smaller) count table — the raw data shuffles
    once, keyed by (group, value) with map-side combine."""
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_n").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *group_cols,
            F.col(value_col).alias("mode_value"),
            F.col("_n").cast("bigint").alias("mode_count"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group type-1 weighted median: the smallest value whose
    cumulative weight reaches half the group's total (exact, not a
    sketch — the robust central-tendency stat when rows carry
    volume/importance weights). Decimal-exact cumulative sums make the
    threshold crossing engine-independent. One shuffle on the group
    key, one sort; output: group cols, ``wmedian``."""
    from pyspark.sql import Window

    keys = list(group_cols)
    w_ord = Window.partitionBy(*keys).orderBy(
        F.col(val_col).asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(*keys)
    cum = F.sum(F.col(weight_col).cast("decimal(38,6)")).over(w_ord)
    total = F.sum(F.col(weight_col).cast("decimal(38,6)")).over(w_all)
    flagged = df.select(
        *keys,
        F.col(val_col).alias("_v"),
        (cum * 2 >= total).alias("_reach"),
    )
    return (
        flagged.filter(F.col("_reach"))
        .groupBy(*keys)
        .agg(F.min("_v").alias("wmedian"))
    )


def ks_two_sample(
    df: DataFrame,
    val_col: str,
    flag_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic: the largest gap
    between the empirical CDFs of the ``flag_col``=true and =false
    populations of ``val_col`` — the standard drift detector between
    two data slices (train vs serve, yesterday vs today). Cumulative
    counts stay integral; the per-row CDF division and |gap| are
    single IEEE ops, so the result is engine-exact. Plan: one
    (value)-grouped count, one ordered window over the distinct-value
    table (small), one max. Output one row:
    ``(ks_stat, n_true, n_false)``."""
    from pyspark.sql import Window

    per_val = df.groupBy(F.col(val_col).alias("_v")).agg(
        F.sum(F.when(F.col(flag_col), 1).otherwise(0)).alias("_a"),
        F.sum(F.when(F.col(flag_col), 0).otherwise(1)).alias("_b"),
    )
    totals = per_val.agg(
        F.sum("_a").cast("bigint").alias("n_true"),
        F.sum("_b").cast("bigint").alias("n_false"),
    )
    # the ordered cumsum runs over the DISTINCT-value table (small);
    # a single ordered partition is fine there — the raw data already
    # pre-aggregated with map-side combine
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_val.select(
        F.sum("_a").over(w).alias("_ca"),
        F.sum("_b").over(w).alias("_cb"),
    )
    gaps = cum.crossJoin(F.broadcast(totals)).select(
        "n_true",
        "n_false",
        F.abs(
            F.col("_ca").cast("double") / F.col("n_true").cast("double")
            - F.col("_cb").cast("double") / F.col("n_false").cast("double")
        ).alias("_gap"),
    )
    return gaps.groupBy("n_true", "n_false").agg(
        F.max("_gap").alias("ks_stat")
    ).select("ks_stat", "n_true", "n_false")


def chi_square_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson χ² test of independence between two categorical
    columns (the segment-vs-behavior association check): observed
    counts stay integral, each expected count is ONE double division,
    each cell's (O−E)²/E is plain IEEE arithmetic, and the cell sum
    accumulates in DECIMAL(38,12) — engine-exact, like the Gini/KS
    siblings. Output one row: ``(chi2, dof, n)``.

    The grid is completed — ZERO cells still contribute (0−E)²/E = E;
    dropping them (they never appear in the grouped counts) would
    understate the statistic exactly where dependence is strongest —
    but it is built FROM THE MARGINAL TABLES (row_tot × col_tot), so
    the grid rows arrive already carrying rt and ct and no marginal is
    ever recomputed against the completed grid (round-7: the r6 plan
    derived marginals from the grid and re-derived the grid per
    consumer — 15 exchanges for a |r|·|c| table; this shape is one
    grouped count, three tiny aggregations off it, then broadcast-only
    joins). The grouped count is tracked-cached: four consumers
    (both marginals, the totals, the grid join) would otherwise each
    re-run the fact scan + shuffle."""
    from medallion_delta_lake_spark.operators.caching import tracked_cache

    observed = tracked_cache(
        df.groupBy(
            F.col(row_col).alias("_r"), F.col(col_col).alias("_c")
        ).agg(F.count(F.lit(1)).alias("_o"))
    )
    row_tot = observed.groupBy("_r").agg(F.sum("_o").alias("_rt"))
    col_tot = observed.groupBy("_c").agg(F.sum("_o").alias("_ct"))
    totals = observed.agg(
        F.sum("_o").cast("bigint").alias("_n"),
        F.countDistinct("_r").alias("_nr"),
        F.countDistinct("_c").alias("_nc"),
    )
    expected = (
        F.col("_rt").cast("double")
        * F.col("_ct").cast("double")
        / F.col("_n").cast("double")
    )
    diff = F.col("_o").cast("double") - expected
    # diff*diff, NOT pow(diff, 2): pow is not correctly-rounded IEEE
    # and may differ across engines; multiplication is exact
    e = (
        row_tot.crossJoin(F.broadcast(col_tot))
        .join(F.broadcast(observed), ["_r", "_c"], "left")
        .select(
            "_rt",
            "_ct",
            F.coalesce(F.col("_o"), F.lit(0)).alias("_o"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "_n",
            "_nr",
            "_nc",
            (diff * diff / expected).alias("_cell"),
        )
    )
    return e.groupBy("_n", "_nr", "_nc").agg(
        F.sum(F.col("_cell").cast("decimal(38,12)"))
        .cast("double")
        .alias("chi2")
    ).select(
        "chi2",
        ((F.col("_nr") - 1) * (F.col("_nc") - 1))
        .cast("bigint")
        .alias("dof"),
        F.col("_n").alias("n"),
    )


def percentile_bands(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    percentiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact type-1 percentiles per group in ONE sort: the k-th order
    statistic at k = ⌈p·n⌉ for each requested p (deterministic under
    ties — the k-th sorted VALUE is well-defined whatever the tie
    order). The multi-cutoff generalization of the manual median;
    approx_quantile trades this exactness for sketches. Output: group
    cols plus one ``p<pct>`` column per requested percentile."""
    from pyspark.sql import Window

    keys = list(group_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(val_col).asc())
    ranked = df.select(
        *keys,
        F.col(val_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(*keys)
        ).alias("_n"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("_rn")
                == F.ceil(F.lit(float(p)) * F.col("_n")).cast("bigint"),
                F.col("_v"),
            )
        ).alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    return ranked.groupBy(*keys).agg(*aggs)


def mann_whitney_u(
    df: DataFrame,
    val_col: str,
    flag_col: str,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) statistic between the
    ``flag_col``=true and =false populations — the rank-based drift
    test that, unlike KS, weighs WHERE the distributions shift, and
    unlike the t-test assumes nothing about shape. Tie handling is the
    standard midrank: every occurrence of a value gets rank
    ``(count before it) + (ties + 1)/2``. Midranks are exact halves,
    the rank-sum accumulates in DECIMAL — engine-exact throughout.
    Plan identical to :func:`ks_two_sample`: one grouped count, one
    ordered window over distinct values. Output one row:
    ``(u_true, u_false, n_true, n_false)`` with
    ``u_true + u_false = n_true·n_false``."""
    from pyspark.sql import Window

    per_val = df.groupBy(F.col(val_col).alias("_v")).agg(
        F.sum(F.when(F.col(flag_col), 1).otherwise(0)).alias("_a"),
        F.sum(F.when(F.col(flag_col), 0).otherwise(1)).alias("_b"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_val.select(
        "_a",
        "_b",
        (
            F.coalesce(F.sum(F.col("_a") + F.col("_b")).over(w), F.lit(0))
            .cast("double")
            + (F.col("_a") + F.col("_b") + 1).cast("double") / F.lit(2.0)
        ).alias("_midrank"),
    )
    sums = ranked.agg(
        F.sum(
            (F.col("_a").cast("double") * F.col("_midrank")).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("_ra"),
        F.sum("_a").cast("bigint").alias("n_true"),
        F.sum("_b").cast("bigint").alias("n_false"),
    )
    return sums.select(
        (
            F.col("_ra")
            - F.col("n_true").cast("double")
            * (F.col("n_true") + 1).cast("double")
            / F.lit(2.0)
        ).alias("u_true"),
        (
            F.col("n_true").cast("double") * F.col("n_false").cast("double")
            - (
                F.col("_ra")
                - F.col("n_true").cast("double")
                * (F.col("n_true") + 1).cast("double")
                / F.lit(2.0)
            )
        ).alias("u_false"),
        "n_true",
        "n_false",
    )


def welch_t(
    df: DataFrame,
    val_col: str,
    flag_col: str,
) -> DataFrame:
    """Welch's unequal-variance t statistic between the
    ``flag_col``=true and =false populations of ``val_col`` — the
    mean-shift drift test completing the KS (distribution) and
    Mann–Whitney (rank) siblings. Means and variances come from
    DECIMAL(38,6)-exact Σx / Σx² per population (one grouped pass with
    map-side combine; no float accumulation order anywhere), and the
    close is a fixed expression tree of IEEE divisions, one sqrt, and
    the Welch–Satterthwaite dof — every op correctly rounded, so the
    result is engine-exact. Output one row:
    ``(t_stat, dof, n_true, n_false)``."""
    flag = F.col(flag_col).cast("boolean")
    v = F.col(val_col)
    s = df.filter(v.isNotNull()).agg(
        F.count(F.when(flag, 1)).alias("_n1"),
        F.count(F.when(~flag, 1)).alias("_n2"),
        F.sum(F.when(flag, v).cast("decimal(38,6)"))
        .cast("double")
        .alias("_s1"),
        F.sum(F.when(~flag, v).cast("decimal(38,6)"))
        .cast("double")
        .alias("_s2"),
        F.sum(F.when(flag, v * v).cast("decimal(38,6)"))
        .cast("double")
        .alias("_q1"),
        F.sum(F.when(~flag, v * v).cast("decimal(38,6)"))
        .cast("double")
        .alias("_q2"),
    )
    n1 = F.col("_n1").cast("double")
    n2 = F.col("_n2").cast("double")
    m1 = F.col("_s1") / n1
    m2 = F.col("_s2") / n2
    # sample variance via the decimal-exact sums: (n·Σx² − (Σx)²)/(n(n−1))
    var1 = (n1 * F.col("_q1") - F.col("_s1") * F.col("_s1")) / (
        n1 * (n1 - F.lit(1.0))
    )
    var2 = (n2 * F.col("_q2") - F.col("_s2") * F.col("_s2")) / (
        n2 * (n2 - F.lit(1.0))
    )
    se1 = var1 / n1
    se2 = var2 / n2
    t_stat = (m1 - m2) / F.sqrt(se1 + se2)
    dof = ((se1 + se2) * (se1 + se2)) / (
        (se1 * se1) / (n1 - F.lit(1.0))
        + (se2 * se2) / (n2 - F.lit(1.0))
    )
    return s.select(
        t_stat.alias("t_stat"),
        dof.alias("dof"),
        F.col("_n1").alias("n_true"),
        F.col("_n2").alias("n_false"),
    )


def theil_sen(
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_points: int = 4000,
) -> DataFrame:
    """Theil–Sen slope estimator — the MEDIAN of all pairwise slopes
    (y_j−y_i)/(x_j−x_i) over x_i < x_j: a robust trend line with a
    29% breakdown point, immune to the outliers that wreck OLS (Sen
    1968). One row out: ``slope``, ``n_points``, ``n_pairs``.

    This is an O(n²)-pairs estimator by definition, so it is meant for
    an AGGREGATED series (daily/weekly rollups — the usual trend-
    monitoring input), never raw rows: the point count is probed first
    and >``max_points`` raises, pointing at pre-aggregation. The
    median is taken WITHOUT interpolation ambiguity: explicit middle
    ranks ((n+1)÷2, (n+2)÷2) under a full slope sort — one narrow
    global sort of n² 8-byte slopes, engine-exact (same two middle
    elements in any engine; their mean is one IEEE add+divide).
    """
    from pyspark.sql import Window as W

    pts = df.select(
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    n_points = pts.count()
    if n_points > max_points:
        raise ValueError(
            f"theil_sen over {n_points} points is {n_points}²/2 pair "
            f"slopes; aggregate the series below max_points="
            f"{max_points} first"
        )
    a, b = pts.alias("a"), pts.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        (
            (F.col("b.y") - F.col("a.y"))
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope")
    )
    ranked = slopes.select(
        "slope",
        F.row_number().over(W.orderBy("slope")).alias("rn"),
    )
    tot = slopes.agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n_pairs") + 2) / 2))
        )
        .agg(
            F.avg("slope").alias("slope"),
            F.lit(n_points).cast("long").alias("n_points"),
            F.first("n_pairs").alias("n_pairs"),
        )
    )


def kendall_tau(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    max_points: int = 4000,
) -> DataFrame:
    """Kendall's τ-b rank correlation — concordant-minus-discordant
    pair fraction with the tie correction: τ_b = (P−Q) /
    √((P+Q+T_x)(P+Q+T_y)). The third rank-correlation next to
    Pearson (stats-corr) and Spearman (stats-spearman-rho); preferred
    when ties are heavy (counts, grades) because the tie terms are
    explicit. One row out: ``tau_b`` + the four pair counts —
    integer-exact pair classification, so engines agree bit-for-bit.

    O(n²) pairs by definition → same ``max_points`` probe-and-raise
    posture as :func:`theil_sen` (τ over raw 100 TB rows is a
    pre-aggregation error, not a bigger cluster's job)."""
    pts = df.select(
        F.col(id_col).alias("i"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    n_points = pts.count()
    if n_points > max_points:
        raise ValueError(
            f"kendall_tau over {n_points} points is O(n²) pairs; "
            f"sample or aggregate below max_points={max_points}"
        )
    a, b = pts.alias("a"), pts.alias("b")
    pair = a.join(b, F.col("a.i") < F.col("b.i")).select(
        (F.col("b.x") - F.col("a.x")).alias("dx"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
    )
    agg = pair.agg(
        F.sum(
            ((F.col("dx") * F.col("dy")) > 0).cast("long")
        ).alias("concordant"),
        F.sum(
            ((F.col("dx") * F.col("dy")) < 0).cast("long")
        ).alias("discordant"),
        F.sum(
            ((F.col("dx") == 0) & (F.col("dy") != 0)).cast("long")
        ).alias("ties_x"),
        F.sum(
            ((F.col("dx") != 0) & (F.col("dy") == 0)).cast("long")
        ).alias("ties_y"),
    )
    p, q = F.col("concordant"), F.col("discordant")
    den2 = (p + q + F.col("ties_x")) * (p + q + F.col("ties_y"))
    return agg.select(
        # driver face: sign + exact-rational τ² quantization (q_div —
        # no double ever formed; τ = sign·√(tau_sq_q12/10¹²))
        F.when(p > q, 1)
        .when(p < q, -1)
        .otherwise(0)
        .cast("int")
        .alias("tau_sign"),
        F.when(
            den2 > 0, q_div((p - q) * (p - q), den2, 12)
        ).alias("tau_sq_q12"),
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        # pytest-only convenience double (registered query drops it:
        # a correctly-rounded ÷/√ chain SHOULD be engine-identical,
        # but this exact shape was driver-red in r8+r9 while locally
        # green under every config — so it stays off the driver face)
        (
            (p - q).cast("double")
            / F.sqrt(den2.cast("double"))
        ).alias("tau_b"),
    )


def count_min_estimate(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count–min sketch frequency estimation, fully distributed: the
    d×w counter grid is built as a (row, bucket) → count aggregation
    (one groupBy — each of the d rows hashes every key with its own
    salt), and a probe key's estimate is the MIN of its d counters.
    Guarantees est ≥ true count (one-sided error), with overshoot
    ≤ εN at probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉ (Cormode &
    Muthukrishnan 2005).

    The grid is d·w integers regardless of corpus size — THE mergeable
    heavy-hitter sketch for 100 TB streams: shards build grids
    independently and counter-wise ADD them (same contract as the HLL
    registers in approx-hll-mergeable). Hashing is the portable
    md5-prefix h64, so the DuckDB oracle rebuilds the identical grid.
    Output: one row per probe key — ``est_count``, ``exact_count``,
    ``overshoot`` (always ≥ 0)."""
    from medallion_delta_lake_spark.functions.hashing import h64

    def bucket(col, r: int):
        return F.pmod(
            h64(F.concat(F.lit(f"{salt}{r}|"), col.cast("string"))),
            F.lit(width),
        )

    key = F.col(key_col)
    grid = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            bucket(key, r).alias("b"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pk = F.col("_pk")
    probe_rows = probes.select(F.col(key_col).alias("_pk")).distinct()
    probe_buckets = probe_rows.select(
        "_pk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), bucket(pk, r).alias("b")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("_pk", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    est = (
        probe_buckets.join(F.broadcast(grid), ["r", "b"], "left")
        .groupBy("_pk")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
    exact = df.groupBy(F.col(key_col).alias("_pk")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return (
        est.join(exact, "_pk", "left")
        .select(
            F.col("_pk").alias(key_col),
            "est_count",
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
            (
                F.col("est_count")
                - F.coalesce("exact_count", F.lit(0))
            ).alias("overshoot"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    z_thresh: float = 3.5,
) -> DataFrame:
    """Robust per-group dispersion + outlier census via the MEDIAN
    ABSOLUTE DEVIATION: median, MAD, and the count of points whose
    robust z-score 0.6745·(x−median)/MAD exceeds ``z_thresh`` (the
    Iglewicz–Hoaglin modified z test — the outlier detector that
    still works when the outliers themselves have wrecked mean and
    stddev). Medians are positional (explicit middle ranks, mean of
    the two middles on even counts) so engines agree exactly; both
    median passes are KEY-PARTITIONED window sorts — per-group, never
    a global single-partition sort — and the final census is one
    grouped aggregate.

    INTEGER-EXACT throughout (round-10 driver-red settlement): each
    value is quantized once to BIGINT micros (``floor(v·10⁶)`` of the
    identical input double — exact in both engines), and every
    downstream quantity is integer arithmetic on those micros:
    ``median_x2_q6`` = 2·median (= lo+hi of the middle ranks, so even
    counts never divide), ``mad_x4_q6`` = 4·MAD (deviations live at
    2×, their median again at 2×), and the modified-z census compares
    ``13490·|2v−median_x2| > 4000·z_thresh·mad_x4`` — the exact
    integer form of ``0.6745·|v−median|/MAD > z_thresh``. No double
    is formed after the quantization, so any engine agrees bit-for-bit
    (the previous double face was driver-red two rounds running while
    locally green under every config). Groups with MAD = 0 are
    excluded from the census (a degenerate constant group has no
    scale)."""
    from pyspark.sql import Window as W

    gc = list(group_cols)
    vq = F.floor(F.col(value_col).cast("double") * F.lit(1e6))
    w = W.partitionBy(*gc).orderBy(
        vq.asc(), F.col(tiebreak_col).asc()
    )
    wc = W.partitionBy(*gc)
    lo = F.floor((F.col("_cnt") + 1) / 2)
    hi = F.floor((F.col("_cnt") + 2) / 2)
    base = df.select(
        *gc,
        vq.alias("_vq"),
        F.col(tiebreak_col).alias("_tb"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_cnt"),
    )
    # lo+hi of the middle ranks = 2·median in micros: SUM over the one
    # (odd n, doubled) or two (even n) middle rows — pure integers
    med = (
        base.filter((F.col("_rn") >= lo) & (F.col("_rn") <= hi))
        .groupBy(*gc)
        .agg(
            F.when(
                F.count(F.lit(1)) == 1, 2 * F.sum("_vq")
            )
            .otherwise(F.sum("_vq"))
            .alias("_m2")
        )
    )
    dev = base.join(med, gc).select(
        *gc,
        "_tb",
        F.abs(2 * F.col("_vq") - F.col("_m2")).alias("_d2"),
        "_m2",
    )
    w2 = W.partitionBy(*gc).orderBy(
        F.col("_d2").asc(), F.col("_tb").asc()
    )
    dev2 = dev.select(
        *gc,
        "_d2",
        "_m2",
        F.row_number().over(w2).alias("_rn"),
        F.count(F.lit(1)).over(W.partitionBy(*gc)).alias("_cnt"),
    )
    mad = (
        dev2.filter((F.col("_rn") >= lo) & (F.col("_rn") <= hi))
        .groupBy(*gc)
        .agg(
            F.first("_m2").alias("_m2"),
            F.when(F.count(F.lit(1)) == 1, 2 * F.sum("_d2"))
            .otherwise(F.sum("_d2"))
            .alias("_mad4"),
        )
    )
    # 0.6745·(d2/2) > z·(mad4/4)  ⇔  2·6745·d2 > 10⁴·z·mad4
    thresh_rhs = int(round(z_thresh * 10_000)) * F.col("_mad4")
    return (
        df.select(*gc, vq.alias("_vq"))
        .join(mad, gc)
        .groupBy(*gc)
        .agg(
            F.first("_m2").alias("median_x2_q6"),
            F.first("_mad4").alias("mad_x4_q6"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("_mad4") != 0)
                    & (
                        F.lit(13490)
                        * F.abs(2 * F.col("_vq") - F.col("_m2"))
                        > thresh_rhs
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


def limb_double(col: "F.Column") -> "F.Column":
    """Engine-exact DECIMAL(38,0)→DOUBLE conversion for NON-NEGATIVE
    values that may exceed 2⁵³. A plain cast is NOT cross-engine safe
    there: DuckDB's int128-decimal→double goes through a two-word
    multiply and lands 1 ulp off the correctly-rounded value Spark/Java
    produce (measured: 31293724858271074718 casts to ...f0 vs ...f1).
    Splitting the zero-padded digit string into three 13-digit limbs
    (each < 10¹³ ≪ 2⁵³, so each cast is exact) and recombining with the
    fixed IEEE chain ``(a·10¹³ + b)·10¹³ + c`` is deterministic in any
    IEEE engine — both engines now round in the same places. The SQL
    mirror is the same lpad/substr expression.

    Scaled decimals work too: a DECIMAL(38,s) prints with exactly
    ``s`` fractional digits in both engines, so stripping the dot
    yields the exact 10^s-scaled integer — the caller divides the
    result by ``10^s`` (one more shared IEEE op)."""
    s = F.lpad(
        F.regexp_replace(col.cast("string"), "[.]", ""), 39, "0"
    )
    a = F.substring(s, 1, 13).cast("double")
    b = F.substring(s, 14, 13).cast("double")
    c = F.substring(s, 27, 13).cast("double")
    return (a * F.lit(1e13) + b) * F.lit(1e13) + c


def limb_double_sql(expr: str) -> str:
    """DuckDB twin of :func:`limb_double` — the identical three-limb
    chain as SQL text, FULLY parenthesized (an unparenthesized
    trailing division reassociates inside products and rounds
    differently). The caller appends ``/ 10^scale`` for scaled
    decimals — also parenthesized."""
    s = f"lpad(replace(CAST(({expr}) AS VARCHAR), '.', ''), 39, '0')"
    return (
        f"((CAST(substr({s}, 1, 13) AS DOUBLE) * 1e13"
        f" + CAST(substr({s}, 14, 13) AS DOUBLE)) * 1e13"
        f" + CAST(substr({s}, 27, 13) AS DOUBLE))"
    )


def kruskal_wallis(
    df: DataFrame,
    val_col: str,
    group_col: str,
    scale: int = 100,
) -> DataFrame:
    """Kruskal–Wallis H test — the k-group generalization of
    Mann–Whitney: did ANY group's value distribution shift? Values are
    integerized at ``scale`` (default cents) so ties are exact, then
    ranked WITHOUT sorting the fact table: a value-frequency table
    (bounded-distinct posture, same as Spearman/Mann–Whitney) yields
    doubled midranks ``d = 2·cum + c + 1`` (kept integral so the
    per-group rank sums accumulate in DECIMAL(38,0), exactly). The
    per-group ``R_i²/n_i`` terms are the one order-sensitive double
    reduction, so they sum in an ORDER BY group cumulative window
    (deterministic addition order in any engine), and the close —
    H, the tie-correction C = 1 − Σ(c³−c)/(N³−N), H_adj = H/C — is a
    fixed IEEE chain of +,−,×,÷ (engine-exact; no transcendentals).

    Scale shape: one grouped frequency pass with map-side combine, a
    broadcast rank-map join back onto the fact rows, one k-row window.

    Output one row: ``(h_stat, h_adj, dof, n, n_groups)``.
    """
    from pyspark.sql import Window as W

    g = F.col(group_col)
    iv = F.round(F.col(val_col).cast("double") * scale, 0).cast(
        "bigint"
    )
    base = df.filter(
        F.col(val_col).isNotNull() & g.isNotNull()
    ).select(g.alias("_g"), iv.alias("_v"))
    freq = base.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    before = W.orderBy("_v").rowsBetween(
        W.unboundedPreceding, -1
    )
    ranks = freq.select(
        "_v",
        (
            2 * F.coalesce(F.sum("_c").over(before), F.lit(0))
            + F.col("_c")
            + 1
        )
        .cast("bigint")
        .alias("_d"),
    )
    per_group = (
        base.join(F.broadcast(ranks), "_v")
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("_ni"),
            F.sum(F.col("_d").cast("decimal(38,0)")).alias("_sdd"),
        )
        .select(
            "_g", "_ni", limb_double(F.col("_sdd")).alias("_sd")
        )
    )
    ties = freq.agg(
        F.sum(
            (
                F.col("_c").cast("decimal(38,0)")
                * F.col("_c")
                * F.col("_c")
                - F.col("_c")
            )
        ).alias("_td"),
        F.sum("_c").alias("_n"),
    ).select(limb_double(F.col("_td")).alias("_t"), "_n")
    term = (F.col("_sd") * F.col("_sd")) / (
        F.lit(4.0) * F.col("_ni").cast("double")
    )
    seq = W.orderBy("_g").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    running = per_group.crossJoin(F.broadcast(ties)).select(
        F.sum(term).over(seq).alias("_s_run"),
        "_t",
        "_n",
    )
    n_d = F.col("_n").cast("double")
    s_val = F.max("_s_run")
    h = (
        F.lit(12.0) / (n_d * (n_d + F.lit(1.0))) * s_val
        - F.lit(3.0) * (n_d + F.lit(1.0))
    )
    c_corr = F.lit(1.0) - F.col("_t") / (n_d * n_d * n_d - n_d)
    return (
        running.groupBy("_t", "_n")
        .agg(
            h.alias("h_stat"),
            (h / c_corr).alias("h_adj"),
            (F.count(F.lit(1)) - 1).alias("dof"),
        )
        .select(
            "h_stat",
            "h_adj",
            F.col("dof").cast("bigint").alias("dof"),
            F.col("_n").cast("bigint").alias("n"),
            (F.col("dof") + 1).cast("bigint").alias("n_groups"),
        )
    )


def jarque_bera(
    df: DataFrame,
    val_col: str,
    group_col: str,
    scale: int = 100,
) -> DataFrame:
    """Jarque–Bera normality screen per group — flags non-Gaussian
    feature distributions from skewness and excess kurtosis:
    ``JB = n/6·(S² + (K−3)²/4)``. Values integerize at ``scale``
    (cents by default) so the four raw power sums Σv..Σv⁴ accumulate
    in DECIMAL(38,0) EXACTLY (v⁴ ≤ 1e19 per row, ~1e31 summed at
    petabyte row counts — inside decimal range, where a double→decimal
    cast of v⁴ would already be engine-divergent). Central moments and
    the standardized close are a fixed IEEE chain (+,−,×,÷,sqrt only;
    ``m2^1.5`` spelled ``m2·sqrt(m2)``); the cents scale cancels in
    the standardized moments. One grouped pass, map-side combined.

    Output per group: ``(group, n, skewness, kurtosis, jb_stat)``.
    """
    g = F.col(group_col)
    iv = F.round(F.col(val_col).cast("double") * scale, 0).cast(
        "decimal(38,0)"
    )
    base = df.filter(
        F.col(val_col).isNotNull() & g.isNotNull()
    ).select(g.alias("_g"), iv.alias("_v"))
    v = F.col("_v")
    s = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("_d1"),
        F.sum(v * v).alias("_d2"),
        F.sum(v * v * v).alias("_d3"),
        F.sum(v * v * v * v).alias("_d4"),
    ).select(
        "_g",
        "n",
        # limb conversion, not a plain cast: Σv⁴ exceeds 2⁵³ already at
        # ~10⁴ rows of cents values, where DuckDB's decimal→double
        # lands 1 ulp off Spark's
        limb_double(F.col("_d1")).alias("_s1"),
        limb_double(F.col("_d2")).alias("_s2"),
        limb_double(F.col("_d3")).alias("_s3"),
        limb_double(F.col("_d4")).alias("_s4"),
    )
    n_d = F.col("n").cast("double")
    mu = F.col("_s1") / n_d
    m2 = F.col("_s2") / n_d - mu * mu
    m3 = (
        F.col("_s3") / n_d
        - F.lit(3.0) * mu * (F.col("_s2") / n_d)
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        F.col("_s4") / n_d
        - F.lit(4.0) * mu * (F.col("_s3") / n_d)
        + F.lit(6.0) * mu * mu * (F.col("_s2") / n_d)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2)
    jb = (
        n_d
        / F.lit(6.0)
        * (
            skew * skew
            + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(4.0)
        )
    )
    return s.select(
        F.col("_g").alias(group_col),
        "n",
        skew.alias("skewness"),
        kurt.alias("kurtosis"),
        jb.alias("jb_stat"),
    )


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Full Pearson correlation matrix over ``cols`` in ONE scan — the
    feature-screening pass a pipeline runs before training (k columns
    → k + k(k+1)/2 decimal sums in a single map-side-combined
    aggregate; never k² passes). Rows with ANY null among ``cols``
    drop first, so every pair sees the same n.

    Exactness (inputs assumed non-negative with ≤ 2 decimals, e.g.
    money/quantities): per-row products have ≤ 4 decimals and cast to
    DECIMAL(38,4) INSIDE the safe zone (|x·y|·10⁴ ≪ 2⁵³ for values to
    ~10⁵); sums accumulate exactly in decimal and convert to double
    via :func:`limb_double` on the 10⁴-scaled integer (plain
    decimal→double casts drift a ulp across engines past 2⁵³), and
    the close per pair is the fixed IEEE Pearson form. Degenerate
    (zero-variance) pairs return NULL via explicit guards.

    Output: one row per unordered pair ``(var_x, var_y, n, corr)``,
    exploded from the single aggregate row — still one scan.
    """
    cs = list(cols)
    base = df.na.drop(subset=cs)
    aggs = [F.count(F.lit(1)).alias("n")]
    dec = "decimal(38,4)"
    for i, a in enumerate(cs):
        aggs.append(F.sum(F.col(a).cast(dec)).alias(f"_s{i}"))
        for j in range(i, len(cs)):
            aggs.append(
                F.sum((F.col(a) * F.col(cs[j])).cast(dec)).alias(
                    f"_q{i}_{j}"
                )
            )
    s = base.agg(*aggs)

    # materialize every limb conversion ONCE as a plain double column:
    # inlining the ~10-op limb expression into each of the 6 pair
    # structs (6 limb instances per corr) exceeded Janino's generated-
    # method limit — whole-stage codegen fell back to interpreted eval
    # and the single-pass aggregate ran 10× slower (measured)
    limbed = ["n"]
    for c in s.columns:
        if c.startswith("_"):
            limbed.append(
                (limb_double(F.col(c)) / F.lit(1e4)).alias(f"_l{c}")
            )
    s = s.select(*limbed)

    def d(name: str) -> F.Column:
        return F.col(f"_l_{name.lstrip('_')}")

    n_d = F.col("n").cast("double")
    pair_structs = []
    for i, a in enumerate(cs):
        for j in range(i + 1, len(cs)):
            b = cs[j]
            varx = n_d * d(f"_q{i}_{i}") - d(f"_s{i}") * d(f"_s{i}")
            vary = n_d * d(f"_q{j}_{j}") - d(f"_s{j}") * d(f"_s{j}")
            cov = n_d * d(f"_q{i}_{j}") - d(f"_s{i}") * d(f"_s{j}")
            corr = F.when(
                (varx > 0) & (vary > 0),
                cov / (F.sqrt(varx) * F.sqrt(vary)),
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("var_x"),
                    F.lit(b).alias("var_y"),
                    corr.alias("corr"),
                )
            )
    return s.select(
        "n", F.explode(F.array(*pair_structs)).alias("_p")
    ).select(
        F.col("_p.var_x").alias("var_x"),
        F.col("_p.var_y").alias("var_y"),
        F.col("n").alias("n"),
        F.col("_p.corr").alias("corr"),
    )
