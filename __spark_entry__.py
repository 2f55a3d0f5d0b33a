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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.QUERIES["q1-pricing-summary"](spark, "/root/testdata/sf0.001")


# Round-14 rotation: the driver checks the FIRST 50 registered
# queries per round (hard window — every CORRECTNESS_r{2..13} has
# exactly 50 rows). Precedence this round (VERDICT r13 #1):
# (1) the 20 faces NEW in round 14 — the r15 + r16 draft cohorts
# (drafted + two-SF oracle-proven in r12, registered this round) —
# never driver-checked, so they must sit inside the window;
# (2) the full 8-id r6-stale remnant (topk-per-group .. window-
# streaks) — after this round no driver row is older than r7;
# (3) 22 of the 48 r7-stale ids, alphabetical (oldest-first drain);
# the remaining 26 (q22-global-sales-opportunity .. window-winsorize)
# lead round 15.
#
# Backlog drain schedule (VERDICT r12 #2, counts corrected per
# ADVICE r13 — committed here so the window-integrity test pins it;
# the draft pile STOPS at the r20 cohort until the backlog is below
# one round's window):
#   r13: register r13+r14 cohorts (20) + 30 r6-stale      → reg 339  [done]
#   r14: register r15+r16 cohorts (20) + 8 r6- + 22 r7-stale → 359
#   r15: register r17+r18 cohorts (20) + 26 r7- + 4 r8-stale → 379
#   r16: register r19+r20 cohorts (20) + 30 r8-stale         → 399
#   r17+: pure staleness drain, oldest-first, 50/round
#   (11 r8 remain after r16, then the r9 block — terminal registry
#   count 399; r20 registers only after its bounded-frame rollup at
#   plans/queries_r20.py:373 is collect-free, VERDICT r13 #6).
_DRIVER_PRIORITY = [
    # (1a) NEW: the r15 cohort
    "agg-bitmap-exact-distinct",
    "graph-label-propagation",
    "stats-ljung-box",
    "ts-classical-decompose",
    "drift-wasserstein-binned",
    "window-vwap-anchored",
    "sample-systematic-everyk",
    "sketch-theta-diff",
    "events-burstiness",
    "text-ttr-windowed",
    # (1b) NEW: the r16 cohort
    "join-bucketed-colocated",
    "dq-expectation-suite",
    "agg-apdex-score",
    "events-markov-2step",
    "ts-drift-naive-forecast",
    "events-retention-bitmap",
    "scan-csv-malformed-audit",
    "graph-kcore-peel",
    "ml-auc-delong-ci",
    "window-rolling-skewness",
    # (2) the r6-stale remnant — fully drains r6
    "topk-per-group",
    "ts-resample-ffill",
    "upsert-merge-state",
    "window-agg-tumbling",
    "window-anomaly-zscore",
    "window-ewma-smooth",
    "window-ohlc-bars",
    "window-streaks",
    # (3) r7-stale cohort, alphabetical (22 of 48 fit the window)
    "agg-gini-coefficient",
    "agg-pareto-abc",
    "agg-weekly-growth",
    "approx-hll-mergeable",
    "graph-triangle-count",
    "join-asof-nearest",
    "join-asof-tolerance",
    "join-null-safe",
    "join-salted-skew",
    "json-funcs",
    "map-funcs",
    "multimodal-byte-features",
    "multimodal-frame-dedup",
    "pandas-group-normalize",
    "pandas-scalar-tokens",
    "pivot-status",
    "q1-sql-entry",
    "q10-returned-items",
    "q16-supplier-cnt",
    "q17-small-quantity-revenue",
    "q18-large-orders",
    "q21-suppliers-waiting",
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
