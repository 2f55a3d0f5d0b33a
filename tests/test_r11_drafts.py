"""Round-11 draft faces (plans/queries_r11.py, unregistered): every
draft must already be oracle-green at two SFs, and importing the
draft module must NOT grow the registered set."""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.plans import queries_r11 as r11
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_draft_module_does_not_register():
    from medallion_delta_lake_spark.plans import registry

    before = set(registry.QUERIES)
    assert not (set(r11.R11_QUERIES) & before), (
        "draft ids must not collide with registered ids"
    )


@pytest.mark.parametrize("name", sorted(r11.R11_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(
        spark, name, r11.R11_QUERIES, r11.R11_ORACLES, sf
    )
