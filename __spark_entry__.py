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


# Round-4 rotation: the driver checks the first ~50 registered queries
# per round; this list is exactly the 47 registry op-ids with NO green
# row in CORRECTNESS_r01∪r02∪r03 (computed from the artifacts), so
# after this round every registered op-id has hard driver evidence.
# The 3 round-3 red rows come first (q12 oracle now CASTs its sums to
# BIGINT; the two array ops now emit driver-hashable scalar columns),
# then the 44 sweep-verified-only ops, then ops changed this round
# that need re-verification.
_DRIVER_PRIORITY = [
    # round-3 driver-red, fixed this round
    "q12-shipmode-priority",
    "agg-collect-array",
    "array-funcs",
    # never inside a driver correctness window (rounds 1-3)
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
    "multimodal-frame-sample",
    "multimodal-audio-chunks",
    "multimodal-resize",
    "text-scrub-pii",
    "text-tfidf-stats",
    "text-lang-id-ngram",
    "text-edit-distance",
    "text-strip-boilerplate",
    "text-repetition-score",
    "sample-stratified-hash",
    "sample-fixed-per-stratum",
    "pack-sequences",
    "sim-ann-self-topk",
    "agg-vector-mean",
    "stream-stateful-stats",
    "stream-stream-join",
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
    "agg-avg-of-sums",
    "dq-constraint-check",
    "json-typed-parse",
    # changed/added this round → (re-)verify in the remaining slots
    # ROUND-5 NOTE: after this round's artifact lands, rotate again to
    # whatever op-ids still lack a green driver row (overflow + any
    # round-5 additions).
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
