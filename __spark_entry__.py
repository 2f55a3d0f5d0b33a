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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.QUERIES["q1-pricing-summary"](spark, "/root/testdata/sf0.001")


# Round-13 rotation: the driver checks the FIRST 50 registered
# queries per round (hard window — every CORRECTNESS_r{2..12} has
# exactly 50 rows). Precedence this round (VERDICT r12 #1/#2):
# (1) the 20 faces NEW in round 13 — the r13 + r14 draft cohorts
# (drafted + two-SF oracle-proven in r12, registered this round;
# OPTIMIZE/RESTORE first so the maintenance family gets its first
# direct CORRECTNESS rows) — never driver-checked, so they must sit
# inside the window;
# (2) 30 of the 38 r6-stale ids, alphabetical (oldest-first drain);
# the remaining 8 (topk-per-group .. window-streaks) lead round 14.
#
# Backlog drain schedule (VERDICT r12 #2 — committed here so the
# window-integrity test pins it; the draft pile STOPS at the r20
# cohort until the backlog is below one round's window):
#   r13: register r13+r14 cohorts (20) + 30 r6-stale      → reg 339
#   r14: register r15+r16 cohorts (20) + 8 r6- + 22 r7-stale → 359
#   r15: register r17+r18 cohorts (20) + 26 r7- + 4 r8-stale → 379
#   r16: register r19+r20 cohorts (12) + 38 r8/r9-stale      → 391
#   r17+: pure staleness drain, oldest-first, 50/round.
_DRIVER_PRIORITY = [
    # (1a) NEW: the r13 cohort (maintenance faces first)
    "maintenance-optimize-zorder",
    "maintenance-restore-version",
    "join-cdf-maintained",
    "agg-cdf-incremental-refresh",
    "sketch-hll-churn-epoch",
    "scan-delta-skipping",
    "scan-parquet-partition-prune",
    "stats-wilcoxon-signed-rank",
    "text-hapax-ratio",
    "dedup-lsh-recall-audit",
    # (1b) NEW: the r14 cohort
    "maintenance-vacuum-retention",
    "maintenance-checkpoint-v2",
    "cluster-kmeans-refine",
    "dedup-semantic-bucketed",
    "events-retention-triangle",
    "stats-cochran-q",
    "window-kaufman-er",
    "agg-trimmed-mean",
    "ml-fbeta-sweep",
    "stats-cohens-d",
    # (2) r6-stale cohort, alphabetical (30 of 38 fit the window)
    "cond-funcs",
    "dedup-cluster-assign",
    "dedup-containment",
    "dedup-ngram-jaccard",
    "dedup-url-canonical",
    "derive-morton-zorder",
    "events-markov-transitions",
    "explode-outer-nulls",
    "explode-token-freq",
    "graph-pagerank-nations",
    "join-asof-forward",
    "join-asof-nearest-abs",
    "join-interval-overlap",
    "multimodal-dhash-bands",
    "multimodal-dhash-pairs",
    "sample-importance-weighted",
    "sample-temperature-mixture",
    "sim-ann-self-topk",
    "sim-knn-join",
    "sort-limit-topn",
    "stats-gini-impurity",
    "stats-ks-two-sample",
    "stats-mann-whitney-u",
    "stream-dedup",
    "text-fingerprint",
    "text-html-strip",
    "text-lang-id",
    "text-quality-score",
    "text-token-stats",
    "text-vocab-overlap",
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
