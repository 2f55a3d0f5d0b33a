"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the op-id registry defined in
``medallion_delta_lake_spark.plans`` (each §2 operator of SURVEY.md as a
(PySpark callable, DuckDB oracle SQL) pair).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from medallion_delta_lake_spark.plans import registry as _registry  # noqa: E402
from medallion_delta_lake_spark.plans import queries_core  # noqa: F401,E402

try:  # extension surface modules register on import; keep core robust
    from medallion_delta_lake_spark.plans import queries_text  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_ml  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_stream  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_rel  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_multimodal  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_tpch  # noqa: F401,E402
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.QUERIES["q1-pricing-summary"](spark, "/root/testdata/sf0.001")


# Round-7 rotation: the driver checks the first ~50 registered queries
# per round. Order: (1) no reds to re-green (CORRECTNESS_r06 = 50/50);
# (2) the 22 ops NEW in round 7 (never driver-checked) and the 2 whose
# Spark code + oracle changed — stats-chi-square / stats-cramers-v
# (marginals-from-observed plan, 15 → 6 exchanges, oracle rewritten to
# the same grid-from-marginals shape); (3) least-recently-verified:
# the 27 r3-green ids pushed past round 6's 50-row cut, the r3
# alphabetical tail, then the r4-green cohort (its remainder spills to
# round 8).
_DRIVER_PRIORITY = [
    # NEW in round 7 (never driver-checked)
    "window-max-drawdown",
    "stats-spearman-rho",
    "stats-welch-t",
    "sample-mixture-epochs",
    "window-cusum-drift",
    "join-asof-tolerance",
    "stats-autocorr-lag1",
    "multimodal-frame-dedup",
    "stream-cusum-monitor",
    "graph-triangle-count",
    "approx-hll-mergeable",
    "merge-clause-state",
    "agg-gini-coefficient",
    "stats-benford-deviation",
    "ts-seasonal-naive",
    "window-winsorize",
    "scd2-history-build",
    "window-range-frame-sum",
    "agg-pareto-abc",
    "window-gap-report",
    "agg-weekly-growth",
    # changed in round 7 (re-verify first)
    "stats-chi-square",
    "stats-cramers-v",
    # last green in r3 — fell past round 6's 50-row cut
    "join-asof-nearest",
    "join-null-safe",
    "join-salted-skew",
    "json-funcs",
    "map-funcs",
    "multimodal-byte-features",
    "pandas-group-normalize",
    "pandas-scalar-tokens",
    "pivot-status",
    "q1-sql-entry",
    "q10-returned-items",
    "q16-supplier-cnt",
    "q17-small-quantity-revenue",
    "q18-large-orders",
    "q21-suppliers-waiting",
    "q22-global-sales-opportunity",
    "q3-shipping-priority",
    "q4-order-priority",
    "q5-local-supplier",
    "q6-forecast-revenue",
    "set-except",
    "set-intersect",
    "sim-ann-lsh",
    "sort-paginate",
    "stats-median-manual",
    "stats-moments",
    "string-funcs",
    # r3 alphabetical tail
    "struct-funcs",
    "time-funcs",
    "unpivot-measures",
    "window-agg-hopping",
    "window-agg-session",
    "window-lag-delta",
    "window-rank-family",
    "window-running-sum",
    # last green in r4
    "agg-avg-of-sums",
    "dq-constraint-check",
    "json-typed-parse",
    "q12-shipmode-priority",
    "agg-collect-array",
    "array-funcs",
    "q2-min-cost-supplier",
    "q7-volume-shipping",
    "q8-market-share",
    "q9-product-profit",
    "q11-important-stock",
    "q13-customer-distribution",
    "q14-promo-revenue",
    "q15-top-supplier",
    "q19-disjunctive-predicates",
    "q20-potential-promotion",
    # ROUND-8 NOTE: rotate again — reds first, round-8 changes, then
    # the remaining r4 cohort (multimodal-frame-sample,
    # multimodal-audio-chunks, multimodal-resize, text-scrub-pii,
    # text-tfidf-stats, text-lang-id-ngram, text-edit-distance,
    # text-strip-boilerplate, sample-stratified-hash,
    # sample-fixed-per-stratum, agg-vector-mean, stream-stateful-stats,
    # stream-static-join, join-full-outer, window-value-family,
    # window-ntile-binning, window-rolling-agg, string-like-family,
    # agg-bitwise, agg-histogram, stats-corr, impute-group-mean,
    # normalize-group-zscore, cohort-retention, funnel-analysis,
    # snapshot-diff, join-range-bucketed, q1-pricing-summary,
    # filter-neq, filter-neq-chain), then the r5 cohort.
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
