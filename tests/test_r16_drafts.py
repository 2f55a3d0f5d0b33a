"""Round-16-cohort faces (plans/queries_r16.py, registered in ROUND
14 alongside the r15 cohort per VERDICT r13 #1): every face must be
oracle-green at two SFs, and the whole cohort must be present in the
registry with byte-identical oracle strings."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_r16 as r16
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_r16_cohort_registered():
    from medallion_delta_lake_spark.plans import registry

    missing = set(r16.R16_QUERIES) - set(registry.QUERIES)
    assert not missing, f"r16 faces not registered: {sorted(missing)}"
    drift = [
        n
        for n, sql in r16.R16_ORACLES.items()
        if registry.ORACLES.get(n) != sql
    ]
    assert not drift, f"registered oracle drifted from module: {drift}"


@pytest.mark.parametrize("name", sorted(r16.R16_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(spark, name, r16.R16_QUERIES, r16.R16_ORACLES, sf)
