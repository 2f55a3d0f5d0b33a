"""Round-14-cohort faces (plans/queries_r14.py, registered in ROUND
13 alongside the r13 cohort per VERDICT r12 #1): every face must be
oracle-green at two SFs, and the whole cohort must be present in the
registry with byte-identical oracle strings."""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.plans import queries_r14 as r14
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_r14_cohort_registered():
    from medallion_delta_lake_spark.plans import registry

    missing = set(r14.R14_QUERIES) - set(registry.QUERIES)
    assert not missing, f"r14 faces not registered: {sorted(missing)}"
    drift = [
        n
        for n, sql in r14.R14_ORACLES.items()
        if registry.ORACLES.get(n) != sql
    ]
    assert not drift, f"registered oracle drifted from module: {drift}"


@pytest.mark.parametrize("name", sorted(r14.R14_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(spark, name, r14.R14_QUERIES, r14.R14_ORACLES, sf)
