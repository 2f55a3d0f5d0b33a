"""Round-13 faces (plans/queries_r13.py, registered in r13): every
face must be oracle-green at two SFs, and the whole cohort must be
present in the registry with byte-identical oracle strings (the r12
hand-off repeated: drafted + proven in r12 while the registry was
frozen, registration is the r13 deliverable — VERDICT r12 #1)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_r13 as r13
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_r13_cohort_registered():
    from medallion_delta_lake_spark.plans import registry

    missing = set(r13.R13_QUERIES) - set(registry.QUERIES)
    assert not missing, f"r13 faces not registered: {sorted(missing)}"
    drift = [
        n
        for n, sql in r13.R13_ORACLES.items()
        if registry.ORACLES.get(n) != sql
    ]
    assert not drift, f"registered oracle drifted from module: {drift}"


@pytest.mark.parametrize("name", sorted(r13.R13_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(spark, name, r13.R13_QUERIES, r13.R13_ORACLES, sf)
