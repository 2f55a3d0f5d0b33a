"""Oracle-parity tests for the extended relational surface
(queries_rel.py), run at sf0.001."""

from __future__ import annotations

import pytest

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
            "stats-",
            "set-intersect",
            "set-except",
            "string-funcs",
            "cond-funcs",
        )
    )
)


@pytest.mark.parametrize("name", REL_IDS)
def test_rel_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


from medallion_delta_lake_spark.plans import queries_tpch  # noqa: F401,E402

TPCH_IDS = sorted(
    n for n in QUERIES if n in ORACLES and n.startswith(("q3-", "q5-", "q10-"))
)


@pytest.mark.parametrize("name", TPCH_IDS)
def test_tpch_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)
