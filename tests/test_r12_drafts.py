"""Round-12 faces (plans/queries_r12.py, registered in r12): every
face must be oracle-green at two SFs, and the whole cohort must be
present in the registry with byte-identical oracle strings (the r11
hand-off repeated: drafted + proven in r11 while the registry was
frozen, registration is the r12 deliverable — plus the two Delta
write-path faces added in r12 itself)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_r12 as r12
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_r12_cohort_registered():
    from medallion_delta_lake_spark.plans import registry

    missing = set(r12.R12_QUERIES) - set(registry.QUERIES)
    assert not missing, f"r12 faces not registered: {sorted(missing)}"
    drift = [
        n
        for n, sql in r12.R12_ORACLES.items()
        if registry.ORACLES.get(n) != sql
    ]
    assert not drift, f"registered oracle drifted from module: {drift}"


@pytest.mark.parametrize("name", sorted(r12.R12_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(spark, name, r12.R12_QUERIES, r12.R12_ORACLES, sf)
