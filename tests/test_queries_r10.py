"""Oracle-parity tests for the round-10 lifecycle queries
(plans/queries_r10.py), run at sf0.001."""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.plans import queries_r10  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

R10_IDS = [
    "scan-delta-identity",
    "stream-merge-clauses",
    "sample-bottomk-quantiles",
    "stats-hodges-lehmann",
]


@pytest.mark.parametrize("name", R10_IDS)
def test_r10_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)
