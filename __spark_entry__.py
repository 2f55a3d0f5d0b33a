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


# Round-5 rotation: the driver checks the first ~50 registered queries
# per round. Order: (1) the 5 round-4 red rows, all fixed this round —
# the 3 streaming queries broken by the testdata's TIMESTAMP_NTZ
# re-encoding (event-time normalization now handles ns-int64 / us-NTZ /
# us-TZ) and the 2 oracle-dtype artifacts (SUM(...) now CAST AS
# BIGINT); (2) ops changed/added in round 5; (3) the least-recently-
# verified ops (last green in CORRECTNESS_r02, computed from the
# artifacts) so driver evidence stays fresh across the registry.
_DRIVER_PRIORITY = [
    # round-4 red, fixed this round
    "stream-window-agg",
    "stream-session-agg",
    "stream-stream-join",
    "text-repetition-score",
    "pack-sequences",
    # round-5 added ops
    "text-decontaminate",
    "dedup-paragraph-blocks",
    "mixture-token-budget",
    "text-token-typicality",
    "vector-quantize-int8",
    "dedup-containment",
    "corpus-shuffle-shards",
    "split-train-holdout",
    "split-leakage-audit",
    "text-ngram-freq",
    "vector-quantize-pq",
    "sim-pq-adc-topk",
    "text-quality-calibrate",
    # least-recently-verified (green r2, not re-checked since)
    "agg-avg-groupby-dynamic",
    "agg-count-distinct",
    "agg-cube",
    "agg-rollup",
    "dedup-embedding-cosine",
    "dedup-exact-hash",
    "dedup-full-row",
    "dedup-latest-per-key",
    "dedup-minhash-lsh",
    "dedup-minhash-sig",
    "dedup-ngram-jaccard",
    "dedup-simhash",
    "dedup-simhash-pairs",
    "derive-case-hour-avail",
    "derive-interval-add",
    "dropna-any",
    "expr-round",
    "filter-isnull",
    "filter-range",
    "join-anti",
    "join-left-asof-eq",
    "join-left-multi-eq",
    "join-left-using",
    "join-range-bands",
    "join-semi",
    "nn-assign",
    "null-profile",
    "project-rename-drop",
    "project-select-expr",
    "set-union",
    "sim-ann-ivf",
    "sim-cosine-topk",
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
    # next-least-recently-verified (green r3)
    "agg-argmax",
    "agg-grouping-sets",
    "agg-salted-skew",
    # ROUND-6 NOTE: rotate again — reds (if any) first, then round-6
    # changes, then the r3-green cohort continuing from approx-distinct
    # (the r5 window covered: the 5 r4 reds, the 9 r5-added ops
    # corpus-shuffle-shards/split-train-holdout/split-leakage-audit/
    # text-ngram-freq/text-decontaminate/dedup-paragraph-blocks/
    # mixture-token-budget/text-token-typicality/vector-quantize-int8/
    # dedup-containment, and the r2-green LRU cohort below).
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
