"""Round-18-cohort faces (plans/queries_r18.py, registered in ROUND
15 alongside the r17 cohort per VERDICT r14 #1): every face must be
oracle-green at two SFs, and the whole cohort must be present in the
registry with byte-identical oracle strings."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_r18 as r18
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_r18_cohort_registered():
    from medallion_delta_lake_spark.plans import registry

    missing = set(r18.R18_QUERIES) - set(registry.QUERIES)
    assert not missing, f"r18 faces not registered: {sorted(missing)}"
    drift = [
        n
        for n, sql in r18.R18_ORACLES.items()
        if registry.ORACLES.get(n) != sql
    ]
    assert not drift, f"registered oracle drifted from module: {drift}"


@pytest.mark.parametrize("name", sorted(r18.R18_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(spark, name, r18.R18_QUERIES, r18.R18_ORACLES, sf)
