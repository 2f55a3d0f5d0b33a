"""Oracle-parity tests for every core op-id (SURVEY.md §5.1), run at
sf0.001 for speed; the driver re-runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_core  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

CORE_ORACLE_IDS = sorted(
    n for n in QUERIES if n in ORACLES and not n.startswith(("text-", "sim-", "doc-"))
)


@pytest.mark.parametrize("name", CORE_ORACLE_IDS)
def test_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


def test_rows_only_queries_run(spark):
    for name in QUERIES:
        if name in ORACLES:
            continue
        df = QUERIES[name](spark, SF_SMOKE)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
