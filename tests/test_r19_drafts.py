"""Round-19 draft faces (plans/queries_r19.py, unregistered): every
draft must already be oracle-green at two SFs, and importing the
draft module must NOT grow the registered set (the same pinned
hand-off that made every registration since r10 zero-risk)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_r19 as r19
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_draft_module_does_not_register():
    from medallion_delta_lake_spark.plans import registry

    assert not (set(r19.R19_QUERIES) & set(registry.QUERIES)), (
        "draft ids must not collide with registered ids"
    )


@pytest.mark.parametrize("name", sorted(r19.R19_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(spark, name, r19.R19_QUERIES, r19.R19_ORACLES, sf)
