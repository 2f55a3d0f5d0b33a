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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.QUERIES["q1-pricing-summary"](spark, "/root/testdata/sf0.001")


# Round-12 rotation: the driver checks the FIRST 50 registered
# queries per round (hard window — every CORRECTNESS_r{2..11} has
# exactly 50 rows). Precedence this round (VERDICT r11 #1/#3/#4):
# (1) the 26 REMAINING r5-stale ids (the r11 window drained the r5
# cohort alphabetically through join-anti; these are the rest —
# promised as the r12 head since r11), so after this round no op's
# latest driver row is older than r6;
# (2) the 14 faces NEW in round 12: the 12 r11-drafted,
# three-SF-proven faces of plans/queries_r12.py (the §2-core scan
# trio first among them) + the 2 Delta write-path faces
# (sink-delta-append-evolve / sink-delta-overwrite-timetravel) —
# never driver-checked, so they must sit inside the window;
# (3) the r6-stale cohort alphabetical — 10 fit; the remaining 38
# roll to round 13.
_DRIVER_PRIORITY = [
    # (1) r5-stale remainder (alphabetical continuation past join-anti)
    "join-left-asof-eq",
    "join-left-multi-eq",
    "join-left-using",
    "join-range-bands",
    "join-semi",
    "mixture-token-budget",
    "nn-assign",
    "null-profile",
    "pack-sequences",
    "project-rename-drop",
    "project-select-expr",
    "set-union",
    "sim-cosine-topk",
    "sim-pq-adc-topk",
    "split-leakage-audit",
    "split-train-holdout",
    "stream-session-agg",
    "stream-stream-join",
    "stream-window-agg",
    "text-decontaminate",
    "text-ngram-freq",
    "text-quality-calibrate",
    "text-repetition-score",
    "text-token-typicality",
    "vector-quantize-int8",
    "vector-quantize-pq",
    # (2) NEW in round 12 (r11 drafts + the Delta write-path faces)
    "scan-csv-typed",
    "scan-json-lines",
    "scan-orc-roundtrip",
    "sink-delta-append-evolve",
    "sink-delta-overwrite-timetravel",
    "sketch-hll-rebuild",
    "sketch-cms-maintained",
    "ml-average-precision",
    "ml-matthews-corr",
    "sample-weighted-bernoulli",
    "variant-key-census",
    "variant-type-profile",
    "events-survival-table",
    "events-cohort-ltv-curve",
    # (3) r6-stale cohort (alphabetical; 10 of 48 fit the window)
    "agg-argmax",
    "agg-grouping-sets",
    "agg-mode-exact",
    "agg-percentile-bands",
    "agg-salted-skew",
    "agg-weighted-median",
    "approx-distinct",
    "approx-freq-items",
    "approx-quantile",
    "cluster-balance-stats",
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
