"""Round-15-cohort faces (plans/queries_r15.py, registered in ROUND
14 alongside the r16 cohort per VERDICT r13 #1): every face must be
oracle-green at two SFs, and the whole cohort must be present in the
registry with byte-identical oracle strings."""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.plans import queries_r15 as r15
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_r15_cohort_registered():
    from medallion_delta_lake_spark.plans import registry

    missing = set(r15.R15_QUERIES) - set(registry.QUERIES)
    assert not missing, f"r15 faces not registered: {sorted(missing)}"
    drift = [
        n
        for n, sql in r15.R15_ORACLES.items()
        if registry.ORACLES.get(n) != sql
    ]
    assert not drift, f"registered oracle drifted from module: {drift}"


@pytest.mark.parametrize("name", sorted(r15.R15_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(spark, name, r15.R15_QUERIES, r15.R15_ORACLES, sf)
