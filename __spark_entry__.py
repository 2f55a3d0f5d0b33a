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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.QUERIES["q1-pricing-summary"](spark, "/root/testdata/sf0.001")


# Round-11 rotation: the driver checks the FIRST 50 registered
# queries per round (hard window — every CORRECTNESS_r{2..10} has
# exactly 50 rows). Precedence this round:
# (1) the seven r10 driver-reds — ROOT CAUSE FOUND AND FIXED this
# round (VERDICT r10): every red oracle (and only the reds) emitted
# a DuckDB HUGEINT output column (SUM(int) / HUGEINT `//`), which
# the driver hashes differently from Spark's int64 while values are
# bit-identical; the oracles now CAST those columns to BIGINT and
# tests/test_oracle_dtype_lint.py makes the class structurally dead;
# (2) the 14 faces NEW in round 11 (drafted + oracle-proven in r10,
# registered this round — never driver-checked);
# (3) the 8-id r4 tail the r10 window cut (promised first in r11);
# (4) the r5-stale cohort alphabetical — 21 fit; the remaining 26
# roll to round 12.
_DRIVER_PRIORITY = [
    # (1) r10 driver-reds — oracle HUGEINT→BIGINT casts landed
    "stats-kendall-tau",
    "stats-mad-outliers",
    "text-ngram-novelty",
    "window-mann-kendall",
    "ml-calibration-bins",
    "stream-merge-clauses",
    "stats-hodges-lehmann",
    # (2) NEW in round 11 (r10 drafts, registered this round)
    "sketch-hll-users",
    "sketch-kmv-distinct",
    "sketch-kmv-overlap",
    "sketch-cms-probe",
    "sketch-bloom-semijoin",
    "sketch-hdr-quantiles",
    "text-bm25-core",
    "variant-shred-orders",
    "sim-jl-components",
    "ts-croston-rate",
    "stream-cms-topk",
    "stream-kmv-distinct",
    "stream-croston-monitor",
    "ml-target-encode-oof",
    # (3) r4 tail the r10 window cut
    "normalize-group-zscore",
    "cohort-retention",
    "funnel-analysis",
    "snapshot-diff",
    "join-range-bucketed",
    "agg-avg-of-sums",
    "dq-constraint-check",
    "json-typed-parse",
    # (4) r5-stale cohort (alphabetical; 21 of 47 fit the window)
    "agg-avg-groupby-dynamic",
    "agg-count-distinct",
    "agg-cube",
    "agg-rollup",
    "corpus-shuffle-shards",
    "dedup-embedding-cosine",
    "dedup-exact-hash",
    "dedup-full-row",
    "dedup-latest-per-key",
    "dedup-minhash-lsh",
    "dedup-minhash-sig",
    "dedup-paragraph-blocks",
    "dedup-simhash",
    "dedup-simhash-pairs",
    "derive-case-hour-avail",
    "derive-interval-add",
    "dropna-any",
    "expr-round",
    "filter-isnull",
    "filter-range",
    "join-anti",
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritized(dict(_registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _prioritized(dict(_registry.ORACLES))
