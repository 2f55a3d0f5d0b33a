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


# Round-6 rotation: the driver checks the first ~50 registered queries
# per round. Order: (1) no reds to re-green (CORRECTNESS_r05 = 50/50);
# (2) ops whose Spark code or oracle changed since the r5 snapshot —
# dedup-ngram-jaccard / dedup-containment (max_df boilerplate cap now
# ON by default, oracle models it) and sim-ann-self-topk (hot-bucket
# guard); (3) least-recently-verified: the 10 r2-green ids that fell
# off r5's 50-row window, then the r3-green cohort (alphabetical from
# agg-argmax; the ~9 alphabetical-tail r3 ids spill to round 7).
_DRIVER_PRIORITY = [
    # NEW in round 6 (never driver-checked)
    "window-ohlc-bars",
    "events-markov-transitions",
    "stats-cramers-v",
    "stats-mann-whitney-u",
    "join-asof-nearest-abs",
    "join-asof-forward",
    "window-streaks",
    "multimodal-dhash-pairs",
    "stats-chi-square",
    "agg-percentile-bands",
    "text-vocab-overlap",
    "window-ewma-smooth",
    "agg-weighted-median",
    "stats-ks-two-sample",
    "sample-temperature-mixture",
    "agg-mode-exact",
    "dedup-url-canonical",
    "text-html-strip",
    "multimodal-dhash-bands",
    "stats-gini-impurity",
    "ts-resample-ffill",
    "window-anomaly-zscore",
    "graph-pagerank-nations",
    "join-interval-overlap",
    "sample-importance-weighted",
    "cluster-balance-stats",
    # changed in round 6 (re-verify first)
    "dedup-ngram-jaccard",
    "dedup-containment",
    "sim-ann-self-topk",
    # last green in r2 — fell off the r5 window at the 50-row cut
    "sim-knn-join",
    "sort-limit-topn",
    "stream-dedup",
    "text-fingerprint",
    "text-lang-id",
    "text-quality-score",
    "text-token-stats",
    "topk-per-group",
    "upsert-merge-state",
    "window-agg-tumbling",
    # last green in r3
    "agg-argmax",
    "agg-grouping-sets",
    "agg-salted-skew",
    "approx-distinct",
    "approx-freq-items",
    "approx-quantile",
    "cond-funcs",
    "dedup-cluster-assign",
    "derive-morton-zorder",
    "explode-outer-nulls",
    "explode-token-freq",
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
    # ROUND-7 NOTE: rotate again — reds first, round-7 changes, then
    # the ~26 r3-cohort ids pushed past the 50-row cut by round 6's
    # twenty-six new ops (everything from dedup-cluster-assign onward in
    # the list above), then the rest of the r3 cohort (struct-funcs,
    # time-funcs, unpivot-measures, window-agg-hopping,
    # window-agg-session, window-lag-delta, window-rank-family,
    # window-running-sum), then the r4-green cohort from
    # agg-avg-of-sums.
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
