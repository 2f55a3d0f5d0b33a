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


# Round-8 rotation: the driver checks the first ~50 registered queries
# per round. Order: (1) ops whose code CHANGED in round 8
# (merge-clause-state: general_merge_state grew insertAll-default
# semantics for value-less insert clauses); (2) ops NEW in round 8
# (appended at the top as they land); (3) least-recently-verified:
# the r4-green cohort that round 7's 50-row window could not reach
# (last driver-checked in CORRECTNESS_r04), then the r5 cohort.
_DRIVER_PRIORITY = [
    # changed in round 8 (re-verify first): merge-clause-state's
    # general_merge_state core grew insertAll + CDC classification;
    # sim-ann-ivf re-registered at nprobe=4 with a multi-probe oracle
    "merge-clause-state",
    "sim-ann-ivf",
    # NEW in round 8
    "drift-total-variation",
    "drift-hellinger-cat",
    "stats-kruskal-wallis",
    "stats-jarque-bera",
    "multimodal-aspect-buckets",
    "window-rolling-autocorr",
    "graph-jaccard-suppliers",
    "agg-corr-matrix",
    "events-attribution-lasttouch",
    "stream-drift-monitor",
    "sample-balanced-classes",
    "agg-herfindahl",
    "scd2-incremental-upsert",
    "dedup-cc-bigstar",
    "stats-theil-sen",
    "stats-kendall-tau",
    "window-rolling-slope",
    "window-regime-segments",
    "sketch-count-min",
    "text-zipf-profile",
    "multimodal-scene-cuts",
    "stats-mad-outliers",
    "stream-gap-monitor",
    "graph-degree-histogram",
    "stats-runs-test",
    "join-bloom-prefilter",
    "agg-latency-histogram",
    "window-bollinger-bands",
    "text-ngram-novelty",
    "stats-brown-forsythe",
    "sample-quality-audit",
    "agg-markov-transition",
    "join-fuzzy-blocked",
    "udtf-chunk-windows",
    "pandas-udaf-median",
    # r4 cohort — last driver-checked in round 4
    "multimodal-frame-sample",
    "multimodal-audio-chunks",
    "multimodal-resize",
    "text-scrub-pii",
    "text-tfidf-stats",
    "text-lang-id-ngram",
    "text-edit-distance",
    "text-strip-boilerplate",
    "sample-stratified-hash",
    "sample-fixed-per-stratum",
    "agg-vector-mean",
    "stream-stateful-stats",
    "stream-static-join",
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
    "q1-pricing-summary",
    "filter-neq",
    "filter-neq-chain",
    # r5 cohort spill (least-recently-verified after the r4 set)
    "agg-grouping-sets",
    "agg-cube-rollup",
    "dedup-exact-hash",
    "dedup-ngram-jaccard",
    "dedup-minhash-sig",
    "dedup-minhash-lsh",
    "dedup-simhash",
    "sim-cosine-topk",
    "text-token-stats",
    "text-quality-score",
    "text-lang-id",
    "text-fingerprint",
    # ROUND-9 NOTE: rotate again — reds first, round-9 changes, then
    # the r4-cohort tail the r8 window could not reach (the 10 late-r8
    # additions pushed ~window-rolling-agg onward past index 50:
    # window-rolling-agg, string-like-family, agg-bitwise,
    # agg-histogram, stats-corr, impute-group-mean,
    # normalize-group-zscore, cohort-retention, funnel-analysis,
    # snapshot-diff, join-range-bucketed, q1-pricing-summary,
    # filter-neq, filter-neq-chain), then the r5 cohort
    # (dedup-simhash-pairs, sim-knn-join, sample-temperature-mix,
    # sample-token-budget, mixture-epoch-plan, multimodal-meta-profile,
    # window-ewma-smooth, window-streaks, window-ohlc-bars,
    # ts-resample-ffill, topk-per-group, stats-ks-two-sample,
    # stats-mann-whitney-u, stats-gini-impurity, ...), then r6.
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
