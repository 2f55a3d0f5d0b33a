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
try:
    from medallion_delta_lake_spark.plans import queries_r10  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_r11  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_r12  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_r13  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_r14  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_r15  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_r16  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_r17  # noqa: F401,E402
except ImportError:
    pass
try:
    from medallion_delta_lake_spark.plans import queries_r18  # noqa: F401,E402
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.QUERIES["q1-pricing-summary"](spark, "/root/testdata/sf0.001")


# Round-15 rotation: the driver checks the FIRST 50 registered
# queries per round (hard window — every CORRECTNESS_r{2..14} has
# exactly 50 rows). Precedence this round (VERDICT r14 #1):
# (1) the 20 faces NEW in round 15 — the r17 + r18 draft cohorts
# (drafted + two-SF oracle-proven in r12, registered this round) —
# never driver-checked, so they must sit inside the window;
# (2) the full 26-id r7-stale remnant (q22-global-sales-opportunity
# .. window-winsorize, alphabetical) — after this round no driver
# row is older than r8;
# (3) the 4 alphabetically-first r8-stale ids (agg-corr-matrix ..
# agg-vector-mean); the remaining 41 r8 ids queue for r16+.
#
# Backlog drain schedule (VERDICT r12 #2, counts corrected per
# ADVICE r13 — committed here so the window-integrity test pins it;
# the draft pile STOPS at the r20 cohort until the backlog is below
# one round's window):
#   r13: register r13+r14 cohorts (20) + 30 r6-stale      → reg 339  [done]
#   r14: register r15+r16 cohorts (20) + 8 r6- + 22 r7-stale → 359  [done]
#   r15: register r17+r18 cohorts (20) + 26 r7- + 4 r8-stale → 379
#   r16: register r19+r20 cohorts (20) + 30 r8-stale         → 399
#   r17+: pure staleness drain, oldest-first, 50/round
#   (11 r8 remain after r16, then the r9 block — terminal registry
#   count 399).
_DRIVER_PRIORITY = [
    # (1a) NEW: the r17 cohort
    "maintenance-convert-parquet",
    "maintenance-clone-table",
    "text-bigram-lm-score",
    "ml-threshold-youden",
    "maintenance-history-audit",
    "stats-mcc-multiclass",
    "ml-regression-metrics",
    "text-chi2-keyness",
    "graph-bfs-distance",
    "window-rolling-mad",
    # (1b) NEW: the r18 cohort
    "stream-cdf-tail",
    "stream-cdf-replica",
    "scan-parquet-schema-merge",
    "ml-brier-decomposition",
    "udtf-split-sentences",
    "events-segment-migration",
    "stats-cochran-armitage",
    "text-crossdoc-ngram-coverage",
    "split-group-kfold",
    "stats-ratio-delta-method",
    # (2) the r7-stale remnant, alphabetical — fully drains r7
    "q22-global-sales-opportunity",
    "q3-shipping-priority",
    "q4-order-priority",
    "q5-local-supplier",
    "q6-forecast-revenue",
    "sample-mixture-epochs",
    "scd2-history-build",
    "set-except",
    "set-intersect",
    "sim-ann-lsh",
    "sort-paginate",
    "stats-autocorr-lag1",
    "stats-benford-deviation",
    "stats-chi-square",
    "stats-median-manual",
    "stats-moments",
    "stats-spearman-rho",
    "stats-welch-t",
    "stream-cusum-monitor",
    "string-funcs",
    "ts-seasonal-naive",
    "window-cusum-drift",
    "window-gap-report",
    "window-max-drawdown",
    "window-range-frame-sum",
    "window-winsorize",
    # (3) r8-stale drain begins, alphabetical (4 of 45 fit)
    "agg-corr-matrix",
    "agg-latency-histogram",
    "agg-markov-transition",
    "agg-vector-mean",
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
