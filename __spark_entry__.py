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
try:
    from medallion_delta_lake_spark.plans import queries_feature  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_mleval  # noqa: F401,E402
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.QUERIES["q1-pricing-summary"](spark, "/root/testdata/sf0.001")


# Round-9 rotation: the driver checks the first ~50 registered queries
# per round. Order: (1) ops whose code CHANGED in round 9 (the three
# r8 reds, now fixed: twap's oracle regained floor(epoch()), wilson's
# z² is double-cast in both engines, brown-forsythe's close moved to
# the deterministic ORDER BY window); (2) the three r8 driver-reds
# that don't reproduce locally (kendall/mad/novelty — green in 4-7
# isolated re-runs; artifact evidence now persists on mismatch via
# tests/oracle.py); (3) the one never-driver-checked id
# (events-sankey-paths); (4) ops NEW in round 9; (5) the stale r3/r4
# cohort (last driver evidence 5+ rounds old), oldest first.
_DRIVER_PRIORITY = [
    # changed in round 9 — re-verify first
    "window-time-weighted-avg",
    "stats-wilson-ci",
    "stats-brown-forsythe",
    "agg-herfindahl",
    # r8 driver-reds, unreproduced locally — settle them
    "stats-kendall-tau",
    "stats-mad-outliers",
    "text-ngram-novelty",
    # never driver-checked (r8 snapshot-commit registration)
    "events-sankey-paths",
    # NEW in round 9 (inserted as they land)
    "feature-point-in-time",
    "window-mann-kendall",
    "stats-cramers-v",
    "agg-l-moments",
    "events-rfm-scores",
    "stats-grubbs-test",
    "sample-weighted-reservoir",
    "window-cusum-mean-shift",
    "normalize-quantile-map",
    "ml-calibration-bins",
    "scan-python-datasource",
    "ml-roc-auc",
    "ml-lift-deciles",
    "ml-pr-at-k",
    "ml-brier-score",
    "ml-confusion-threshold",
    "ml-ndcg-at-k",
    "ts-holt-linear",
    "agg-bootstrap-poisson-ci",
    "ml-group-auc",
    "ml-ks-separation",
    "events-conversion-lag",
    "stats-anova-oneway",
    "agg-seasonal-index",
    "sim-centroid-outliers",
    "stream-holt-monitor",
    "window-rolling-median",
    "affinity-basket-pairs",
    "stats-permutation-test",
    "events-seasonal-anomaly",
    "window-rsi",
    "agg-hdr-percentiles",
    "stats-cohens-kappa",
    "ml-expected-calibration-error",
    "stats-friedman-test",
    "agg-tukey-fences",
    "join-nn-match-1d",
    "stats-matched-uplift",
    "stats-durbin-watson",
    "stats-sign-test",
    "stats-two-proportion-z",
    "stats-cuped-theta",
    "stats-ols-slope-group",
    "agg-xyz-classification",
    # all-integer ops (zero float-close risk) — positioned last so
    # they are the ones a ~50-row driver window cuts; each is
    # sweep-green at 3 SFs and rolls to the head of round 10
    "events-dau-wau-mau",
    "window-donchian-channel",
    "events-new-vs-returning",
    "stats-srm-check",
    "dedup-rate-by-source",
    "text-top-terms",
    # r3 cohort — last driver-checked in round 3
    "unpivot-measures",
    "window-running-sum",
    "window-lag-delta",
    "window-agg-session",
    "time-funcs",
    "window-agg-hopping",
    "window-rank-family",
    "struct-funcs",
    # r4 cohort — last driver-checked in round 4
    "q1-pricing-summary",
    "filter-neq",
    "filter-neq-chain",
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
    "join-full-outer",
    "window-value-family",
    "window-ntile-binning",
    "window-rolling-agg",
    "string-like-family",
    "agg-bitwise",
    "agg-histogram",
    "stats-corr",
    "impute-group-mean",
    "normalize-group-zscore",
    "cohort-retention",
    "funnel-analysis",
    "snapshot-diff",
    "join-range-bucketed",
    "agg-avg-of-sums",
    "dq-constraint-check",
    "json-typed-parse",
    # ROUND-10 NOTE: round 9 registered 29 new ops, so the 50-row
    # window = 8 changed/settle + 29 new (the no-never-checked gate
    # outranks backlog draining after r8's snapshot-commit reds) +
    # the r3 cohort + the r4 head. Whatever r4 tail the window missed
    # rolls FIRST next round, then the r5 cohort (dedup family,
    # sim-cosine-topk, text-token-stats, ...), then r6.
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
