"""Oracle-parity tests for the extended relational surface
(queries_rel.py), run at sf0.001."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_rel  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

REL_IDS = sorted(
    n
    for n in QUERIES
    if n in ORACLES
    and n.startswith(
        (
            "join-asof-nearest",
            "join-range",
            "join-semi",
            "join-anti",
            "agg-rollup",
            "agg-cube",
            "agg-grouping",
            "pivot-",
            "unpivot-",
            "explode-",
            "window-running",
            "window-lag",
            "window-agg-session",
            "window-agg-hopping",
            "window-rank-family",
            "agg-argmax",
            "sort-paginate",
            "derive-morton",
            "struct-funcs",
            "map-funcs",
            "explode-outer",
            "q1-sql",
            "stats-",
            "set-intersect",
            "set-except",
            "string-funcs",
            "cond-funcs",
            "time-funcs",
            "json-funcs",
            "array-funcs",
            "agg-collect-array",
            "join-null-safe",
            "agg-salted-skew",
        )
    )
)


@pytest.mark.parametrize("name", REL_IDS)
def test_rel_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


from medallion_delta_lake_spark.plans import queries_tpch  # noqa: F401,E402

TPCH_IDS = sorted(
    n for n in QUERIES if n in ORACLES and n.startswith(("q3-", "q5-", "q10-", "q6-", "q12-", "q18-"))
)


@pytest.mark.parametrize("name", TPCH_IDS)
def test_tpch_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


def test_approx_quantile_brackets_exact_median(spark):
    # the registered query now SELF-checks the rank-error bound and
    # emits within_bound (oracle-verified); here we assert the flag is
    # actually TRUE for every group, and separately that the raw sketch
    # median lands within 2% of the exact one
    from medallion_delta_lake_spark.plans.registry import QUERIES as Q, table as T
    from pyspark.sql import functions as F

    rows = Q["approx-quantile"](spark, SF_SMOKE).collect()
    assert rows and all(r.within_bound for r in rows)

    ev = T(spark, SF_SMOKE, "events")
    approx = {
        r.event_type: r.q50
        for r in ev.groupBy("event_type")
        .agg(F.percentile_approx("value", 0.5, 10000).alias("q50"))
        .collect()
    }
    exact = {
        r.event_type: r.median
        for r in Q["stats-median-manual"](spark, SF_SMOKE).collect()
    }
    for et, med in exact.items():
        assert abs(approx[et] - med) <= 0.02 * max(1.0, abs(med))


def test_freq_items_contains_true_heavy_hitters(spark):
    # the registered query self-checks the superset guarantee and emits
    # all_contained (oracle-verified); assert it holds, and that the
    # exact heavy-hitter counts it reports match an independent count
    from medallion_delta_lake_spark.plans.registry import QUERIES as Q, table as T

    row = Q["approx-freq-items"](spark, SF_SMOKE).first()
    assert row.all_contained
    ev = T(spark, SF_SMOKE, "events")
    n = ev.count()
    true_heavy = {
        r.event_type
        for r in ev.groupBy("event_type").count().collect()
        if r["count"] > 0.1 * n
    }
    assert row.n_heavy_types == len(true_heavy)
