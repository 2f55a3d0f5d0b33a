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


# Ops that still need (or this round changed and need fresh) driver-side
# correctness evidence come first: the round-2 driver artifact covered
# exactly the first 50 registered queries, leaving the tail of the
# registry sweep-verified only. Listing those 39 + the new/changed ops
# first puts them inside the driver's correctness window this round;
# everything else (already driver-green in CORRECTNESS_r02.json) follows
# in registration order.
_DRIVER_PRIORITY = [
    # new this round
    "join-salted-skew",
    "q4-order-priority",
    "q16-supplier-cnt",
    "q21-suppliers-waiting",
    # driver-unchecked in round 2 (registration indices 50-88)
    "q3-shipping-priority",
    "q5-local-supplier",
    "q10-returned-items",
    "q6-forecast-revenue",
    "q12-shipmode-priority",
    "q18-large-orders",
    "multimodal-byte-features",
    "pandas-scalar-tokens",
    "pandas-group-normalize",
    "agg-grouping-sets",
    "pivot-status",
    "unpivot-measures",
    "explode-token-freq",
    "window-running-sum",
    "window-lag-delta",
    "window-agg-session",
    "stats-moments",
    "stats-median-manual",
    "set-intersect",
    "set-except",
    "string-funcs",
    "cond-funcs",
    "time-funcs",
    "approx-quantile",
    "agg-salted-skew",
    "window-agg-hopping",
    "agg-collect-array",
    "join-null-safe",
    "json-funcs",
    "array-funcs",
    "window-rank-family",
    "agg-argmax",
    "sort-paginate",
    "q1-sql-entry",
    "derive-morton-zorder",
    "approx-freq-items",
    "struct-funcs",
    "map-funcs",
    "explode-outer-nulls",
    # ROUND-4 NOTE: once this round's driver artifact lands, rotate this
    # list to the ops still lacking driver rows. The registry is now 140
    # queries vs the driver's 50-per-round window, so full driver
    # coverage is a rotation: round 4 should list the ~45 round-3
    # additions that are sweep-verified only (every query registered
    # after "stream-session-agg" in plans/* — q2/q7/q8/q9/q11/q13/q14/
    # q15/q19/q20 analogs, the multimodal trio, scrub/tfidf/lang-ngram/
    # edit-distance/boilerplate/repetition/pack-sequences text ops,
    # sampling pair, stream-stateful/stream-stream/stream-static,
    # full-outer/value-family/ntile/rolling windows, like/bitwise/
    # histogram/corr/zscore/cohort/funnel/avg-of-sums/dq/json-typed/
    # snapshot-diff/range-bucketed/self-topk/vector-mean), capped at 50;
    # any overflow plus round-4 additions rotate into round 5.
    # oracle upgraded / implementation reworked this round → re-verify
    "dedup-cluster-assign",
    "approx-distinct",
    "join-asof-nearest",
    "sim-ann-lsh",
    "stream-session-agg",
    # two of the wave-2 TPC-H analogs fit in the remaining window
    # slots; the rest are sweep-verified this round, driver next round
    # (sim-ann-ivf is unchanged and already driver-green in round 2)
    "q17-small-quantity-revenue",
    "q22-global-sales-opportunity",
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
