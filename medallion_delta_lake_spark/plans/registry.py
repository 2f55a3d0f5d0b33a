"""Query registry: op-id → (PySpark callable, optional DuckDB oracle SQL).

This is the correctness face of the engine (SURVEY.md §5.1): every
operator claimed in SURVEY.md §2 registers a query over the driver
testdata plus an ANSI-SQL oracle. ``__spark_entry__.py`` re-exports it.

Float-determinism contract used throughout (so order-insensitive
value-hash comparison against DuckDB is exact, not approximate):

- SUM/AVG over doubles accumulate in DECIMAL(38,6) — decimal addition
  is exact and associative, so the result does not depend on row order,
  partitioning, or engine; the final value is cast back to DOUBLE.
- Per-row double arithmetic (x*(1-d), abs(a-b), ratios) is fine as-is:
  IEEE-754 ops on identical inputs are bit-identical in any engine.
- ROUND on non-integer doubles is avoided (Spark rounds the shortest
  decimal repr HALF_UP, DuckDB rounds the binary value — they disagree
  on values like 123.45); rounding only ever applies to exactly
  representable inputs (integers, halves). The same split applies to
  double→DECIMAL casts, so full-precision doubles are never cast to
  decimal either.
- A k-term reduction over per-row DOUBLES (one per group/cell) is
  order-sensitive. k ≤ ~17: sum in a SUM() OVER (ORDER BY key ROWS
  UNBOUNDED PRECEDING) window + MAX (sequential in both engines).
  Larger k: DuckDB's windowed SUM reassociates (segment tree), so
  quantize each term via floor(x·10^s)→BIGINT (floor of the identical
  double is exact in both engines) and sum the integers — exact in
  any order; divide by 10^s once at the close.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an op-id. ``oracle=None`` → driver does a rows-only check
    (reserved for genuinely non-SQL-expressible / approximate ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table.

    ``events.parquet``'s ``ts`` column has shipped in three physical
    encodings across testdata regenerations; normalize every one to a
    session-tz TIMESTAMP so downstream plans (and ``withWatermark``,
    which rejects TIMESTAMP_NTZ) see a single stable type:

    - TIMESTAMP(NANOS) → read nanos as long (legacy conf; Spark 4
      rejects nanos otherwise) and convert with integer division
      (float division would lose precision — epoch-nanos exceed 2^53).
      DuckDB truncates nanos→micros the same way, so oracles stay exact.
    - TIMESTAMP(MICROS) without timezone → Spark TIMESTAMP_NTZ; cast to
      TIMESTAMP. The session tz is pinned UTC, so wall-clock values are
      unchanged and match the naive DuckDB oracle bit-for-bit.
    - TIMESTAMP(MICROS) with UTC timezone → already the target type.
    """
    # pin UTC so timestamp values match the (naive-UTC) DuckDB oracle even
    # when the harness session was built without our get_spark() defaults
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return _normalize_event_time(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Coerce the events ``ts`` column to TIMESTAMP regardless of how the
    parquet encoded it (ns-int64 / us-NTZ / us-TZ). See ``table``."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df

# ---------------------------------------------------------------------
# DOUBLE-face allowlist (round-10 driver-red forensics, VERDICT r9 #8).
#
# Five ops went driver-hash-red across r8/r9 with a shared signature —
# integer cores + one closing DOUBLE produced by division/sqrt — while
# green locally under every config. Those faces are now all-integer
# (q_div), and THIS lint keeps the class closed: every registered
# query whose output schema contains a DOUBLE/FLOAT column must appear
# here with its exact double-column tuple
# (tests/test_schema_lint.py re-derives every face at sf0.001 and
# diffs). A new op, or a new double column on an existing op, fails
# the lint until it is reviewed and added.
#
# What earns a place here (the engine-stable double categories):
# - data passthrough: the column IS source data (value, l_quantity);
# - per-row IEEE chains on identical inputs: one +,-,*,/,sqrt chain
#   per OUTPUT ROW (x*(1-d), ratios, z per row) — correctly-rounded
#   ops, bit-identical in any engine;
# - decimal/limb-derived closes: DECIMAL(38,s)-exact accumulation,
#   limb_double conversion, ONE shared IEEE close (sums, means, CIs);
# - quantized-integer casts: BIGINT/10^s where the integer is exact.
# NOT allowed (the r8/r9 red class): a double formed from cross-row
# integer aggregates by division/sqrt as the FINAL checked value when
# an exact integer rational (q_div) can carry it instead.
# ---------------------------------------------------------------------
DOUBLE_FACE_ALLOWLIST: dict[str, tuple[str, ...]] = {
    'affinity-basket-pairs': ('support', 'confidence', 'lift'),
    'agg-argmax': ('top_value',),
    'agg-avg-groupby-dynamic': ('l_quantity', 'l_extendedprice', 'l_discount', 'l_tax'),
    'agg-avg-of-sums': ('avg_cust_total',),
    'agg-bootstrap-poisson-ci': ('point_mean', 'ci_lo', 'ci_hi'),
    'agg-corr-matrix': ('corr',),
    'agg-gini-coefficient': ('gini',),
    'agg-herfindahl': ('hhi',),
    'agg-histogram': ('sum_qty',),
    'agg-l-moments': ('l1', 'l2', 't3', 'l_cv'),
    # r14 cohort (registered r13): each double is a FINAL per-row
    # IEEE division of exact integer cores (identical in any engine;
    # oracle-proven at three SFs while drafted)
    'agg-trimmed-mean': ('trimmed_mean',),
    'agg-markov-transition': ('p',),
    'agg-pareto-abc': ('spend',),
    'agg-percentile-bands': ('p25', 'p50', 'p75', 'p95'),
    'agg-rollup': ('sum_qty',),
    'agg-salted-skew': ('total',),
    'agg-seasonal-index': ('mean_value', 'seasonal_index'),
    'agg-tukey-fences': ('q1', 'q3'),
    'agg-vector-mean': ('mean_x',),
    'agg-weekly-growth': ('revenue', 'wow_growth'),
    'agg-weighted-median': ('wmedian',),
    'array-funcs': ('first_dim', 'head4_sum'),
    'cluster-balance-stats': ('mean_dot',),
    'cond-funcs': ('disc_or_sentinel', 'max_rate', 'min_rate'),
    'dedup-containment': ('containment',),
    'dedup-embedding-cosine': ('cosine',),
    'dedup-latest-per-key': ('value',),
    'dedup-minhash-lsh': ('jaccard',),
    'dedup-ngram-jaccard': ('jaccard',),
    'dedup-paragraph-blocks': ('dup_frac',),
    'dedup-rate-by-source': ('dup_rate',),
    'drift-hellinger-cat': ('bhattacharyya', 'hellinger'),
    'drift-total-variation': ('gap', 'tv_distance'),
    'dropna-any': ('v',),
    'events-attribution-lasttouch': ('attributed_value',),
    # r15/r16 cohorts (registered r14): each double is a FINAL
    # IEEE division/sqrt of exact integer cores (bit-identical in
    # any engine; oracle-proven at two SFs while drafted)
    'events-burstiness': ('mean_gap_s', 'burstiness'),
    'events-dau-wau-mau': ('stickiness',),
    'events-markov-transitions': ('p',),
    'events-new-vs-returning': ('returning_share',),
    'events-rfm-scores': ('monetary',),
    'events-seasonal-anomaly': ('value', 'z_score'),
    'expr-round': ('half_qty',),
    'filter-neq': ('l_quantity',),
    'filter-range': ('l_quantity',),
    'graph-jaccard-suppliers': ('jaccard',),
    'graph-pagerank-nations': ('rank',),
    'impute-group-mean': ('value_imputed',),
    'join-asof-forward': ('next_order_total',),
    'join-asof-nearest': ('order_total',),
    'join-asof-nearest-abs': ('nearest_total',),
    'join-asof-tolerance': ('order_total',),
    'join-bloom-prefilter': ('o_totalprice',),
    'join-left-asof-eq': ('day_value',),
    'join-left-multi-eq': ('flag_qty',),
    'join-nn-match-1d': ('treated_value', 'match_distance'),
    'join-range-bands': ('sum_qty',),
    'join-range-bucketed': ('sum_qty',),
    'join-semi': ('o_totalprice',),
    'merge-clause-state': ('c_acctbal',),
    'mixture-token-budget': ('keep_rate',),
    'ml-auc-delong-ci': ('auc', 'var_auc', 'se_auc', 'ci_lo95', 'ci_hi95'),
    'ml-brier-score': ('brier', 'base_rate', 'brier_skill'),
    'ml-confusion-threshold': ('accuracy', 'precision', 'recall', 'f1'),
    'ml-expected-calibration-error': ('ece',),
    'ml-fbeta-sweep': ('f_half', 'f1', 'f2'),
    'ml-group-auc': ('auc',),
    'ml-ks-separation': ('ks_stat',),
    'ml-lift-deciles': ('lift', 'cum_capture'),
    # one shared IEEE chain (4 casts of exact integer cells, 3
    # products, sqrt) per row off exact integer confusion cells —
    # bit-identical in both engines; degenerate rows pinned to 0.0
    'ml-matthews-corr': ('mcc',),
    'ml-ndcg-at-k': ('ndcg',),
    # r17+r18 cohorts (registered r15, reviewed AT registration):
    # every double below is a final per-row IEEE close over exact
    # integer/quantized cores — oracle-proven at two SFs while
    # drafted (tests/test_r17_drafts.py / test_r18_drafts.py).
    #   ml-regression-metrics.rmse_cents: one sqrt of an exact
    #     integer mean of quantized squared errors;
    #   stats-mcc-multiclass.mcc: one quotient/sqrt chain over
    #     exact integer confusion-matrix sums (binary twin:
    #     ml-matthews-corr);
    #   stats-cochran-armitage.z: T/sqrt(V) with integer T, V;
    #   stats-ratio-delta-method.{ratio,se_ratio}: one division /
    #     one sqrt-of-rational over exact integer moments;
    #   window-rolling-mad.{value,rolling_median,rolling_mad}:
    #     value is source data; both rollings are element
    #     SELECTIONS from the sorted trailing frame (no float
    #     arithmetic at all — same category as
    #     window-rolling-median).
    'ml-regression-metrics': ('rmse_cents',),
    'ml-pr-at-k': ('precision', 'recall'),
    'ml-roc-auc': ('auc', 'gini'),
    'nn-assign': ('nn_dist',),
    'normalize-group-zscore': ('zscore',),
    'normalize-quantile-map': ('value', 'mapped_value'),
    'pandas-group-normalize': ('value', 'delta_from_mean'),
    'pandas-udaf-median': ('median',),
    'project-select-expr': ('disc_price', 'double_qty'),
    'q1-pricing-summary': ('sum_qty', 'sum_base_price', 'sum_disc_price', 'sum_charge', 'avg_qty', 'avg_price', 'avg_disc'),
    'q1-sql-entry': ('sum_qty',),
    'q10-returned-items': ('revenue', 'c_acctbal'),
    'q11-important-stock': ('val',),
    'q14-promo-revenue': ('promo_revenue',),
    'q15-top-supplier': ('total_revenue',),
    'q17-small-quantity-revenue': ('avg_yearly',),
    'q18-large-orders': ('total_qty',),
    'q19-disjunctive-predicates': ('revenue',),
    'q2-min-cost-supplier': ('min_cost',),
    'q20-potential-promotion': ('s_acctbal',),
    'q22-global-sales-opportunity': ('totacctbal',),
    'q3-shipping-priority': ('revenue',),
    'q5-local-supplier': ('revenue',),
    'q6-forecast-revenue': ('revenue',),
    'q7-volume-shipping': ('revenue',),
    'q8-market-share': ('mkt_share',),
    'q9-product-profit': ('sum_profit',),
    'sample-quality-audit': ('ks_stat',),
    'sample-weighted-reservoir': ('value',),
    'scan-python-datasource': ('sum_value',),
    'sim-ann-ivf': ('cosine',),
    'sim-ann-lsh': ('cosine',),
    'sim-ann-self-topk': ('cosine',),
    'sim-centroid-outliers': ('dist2',),
    'sim-cosine-topk': ('cosine',),
    'sim-jl-components': ('c0', 'c1', 'c2', 'c3', 'c4', 'c5', 'c6', 'c7'),
    'sim-knn-join': ('cosine',),
    'sim-pq-adc-topk': ('adc_dist',),
    'sort-limit-topn': ('o_totalprice',),
    'sort-paginate': ('o_totalprice',),
    'split-leakage-audit': ('jaccard',),
    'stream-croston-monitor': ('z', 'p', 'demand_rate'),
    'stats-anova-oneway': ('ss_between', 'ss_within', 'f_stat'),
    'stats-autocorr-lag1': ('autocorr_lag1',),
    'stats-benford-deviation': ('total_variation',),
    'stats-brown-forsythe': ('f_stat',),
    'stats-chi-square': ('chi2',),
    'stats-cochran-armitage': ('z',),
    'stats-cochran-q': ('q_stat',),
    'stats-cohens-d': ('mean_diff', 'cohens_d'),
    'stats-cohens-kappa': ('p_obs', 'p_exp', 'kappa'),
    'stats-corr': ('corr_qty_disc',),
    'stats-cramers-v': ('chi2', 'cramers_v'),
    'stats-cuped-theta': ('theta', 'corr2'),
    'stats-durbin-watson': ('dw_stat',),
    'stats-friedman-test': ('chi2_f',),
    'stats-gini-impurity': ('gini',),
    'stats-grubbs-test': ('mean_v', 'sd_v', 'g_stat'),
    'stats-jarque-bera': ('skewness', 'kurtosis', 'jb_stat'),
    'stats-kruskal-wallis': ('h_stat', 'h_adj'),
    'stats-ks-two-sample': ('ks_stat',),
    'stats-ljung-box': ('r1', 'r2', 'r3', 'r4', 'r5', 'q_stat'),
    'stats-mann-whitney-u': ('u_true', 'u_false'),
    'stats-matched-uplift': ('treated_mean', 'control_mean', 'uplift'),
    'stats-mcc-multiclass': ('mcc',),
    'stats-median-manual': ('median',),
    'stats-moments': ('mean', 'var_samp', 'stddev_samp'),
    'stats-ols-slope-group': ('slope_units_per_cent',),
    'stats-permutation-test': ('diff_obs', 'p_value'),
    'stats-ratio-delta-method': ('ratio', 'se_ratio'),
    'stats-runs-test': ('z',),
    'stats-sign-test': ('z_stat',),
    'stats-spearman-rho': ('spearman_rho',),
    'stats-srm-check': ('ratio_a', 'chi2'),
    'stats-theil-sen': ('slope',),
    'stats-two-proportion-z': ('rate_a', 'rate_b', 'rate_diff', 'z_stat'),
    'stats-welch-t': ('t_stat', 'dof'),
    'stats-wilson-ci': ('p_hat', 'ci_lo', 'ci_hi'),
    'stream-cusum-monitor': ('cusum_max',),
    'stream-drift-monitor': ('tv_distance',),
    'stream-holt-monitor': ('level', 'trend'),
    'stream-stateful-stats': ('total_value',),
    'stream-window-agg': ('total_value',),
    'struct-funcs': ('double_price',),
    'text-quality-score': ('stopword_ratio', 'punct_ratio', 'mean_token_len'),
    'text-repetition-score': ('top_bigram_frac',),
    'text-token-stats': ('mean_token_len',),
    'text-token-typicality': ('typicality',),
    'text-vocab-overlap': ('jaccard',),
    'topk-per-group': ('value',),
    'ts-croston-rate': ('z', 'p', 'demand_rate'),
    'ts-holt-linear': ('x', 'level', 'trend'),
    'ts-resample-ffill': ('value',),
    'ts-seasonal-naive': ('value', 'baseline', 'residual'),
    'unpivot-measures': ('value',),
    'upsert-merge-state': ('o_totalprice',),
    'vector-quantize-pq': ('dist',),
    'window-agg-hopping': ('total_value',),
    'window-agg-tumbling': ('total_value',),
    'window-anomaly-zscore': ('value', 'zscore'),
    'window-bollinger-bands': ('mid', 'upper', 'lower'),
    'window-cusum-drift': ('cusum_max',),
    'window-kaufman-er': ('er',),
    'window-cusum-mean-shift': ('s_cusum',),
    'window-donchian-channel': ('value', 'channel_hi', 'channel_lo'),
    'window-ewma-smooth': ('value', 'ewma'),
    'window-lag-delta': ('value', 'delta'),
    'window-max-drawdown': ('max_drawdown', 'peak'),
    'window-ntile-binning': ('value', 'pct_rank', 'cume'),
    'window-ohlc-bars': ('open', 'high', 'low', 'close', 'volume'),
    'window-range-frame-sum': ('hour_sum',),
    'window-rank-family': ('value',),
    'window-rolling-agg': ('value', 'roll_sum', 'roll_min', 'roll_max'),
    'window-rolling-autocorr': ('roll_autocorr',),
    'window-rolling-mad': ('value', 'rolling_median', 'rolling_mad'),
    'window-rolling-median': ('value', 'rolling_median'),
    'window-rolling-skewness': ('skew_g1',),
    'window-rolling-slope': ('slope7',),
    'window-rsi': ('rsi',),
    'window-running-sum': ('value', 'running_total'),
    'window-time-weighted-avg': ('twap',),
    'window-value-family': ('value', 'first_v', 'last_v', 'third_v', 'next_v'),
    'window-winsorize': ('value', 'winsorized'),
}
