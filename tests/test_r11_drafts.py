"""Round-11 faces (plans/queries_r11.py, registered in r11): every
face must be oracle-green at two SFs, and the whole cohort must be
present in the registry with byte-identical oracle strings (the r10
draft pin inverted: in r10 these were pinned UNregistered to keep
the driver window on reds; in r11 registration IS the deliverable)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_r11 as r11
from tests.oracle import compare_query

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_r11_cohort_registered():
    from medallion_delta_lake_spark.plans import registry

    missing = set(r11.R11_QUERIES) - set(registry.QUERIES)
    assert not missing, f"r11 faces not registered: {sorted(missing)}"
    drift = [
        n
        for n, sql in r11.R11_ORACLES.items()
        if registry.ORACLES.get(n) != sql
    ]
    assert not drift, f"registered oracle drifted from module: {drift}"


@pytest.mark.parametrize("name", sorted(r11.R11_QUERIES))
@pytest.mark.parametrize("sf", SFS)
def test_draft_oracle_green(spark, name, sf):
    compare_query(
        spark, name, r11.R11_QUERIES, r11.R11_ORACLES, sf
    )


def test_driver_priority_ids_all_registered():
    """A typo in _DRIVER_PRIORITY silently drops the id from the
    window and lets a random op in — every listed id must exist and
    the first 50 of queries() must be exactly the list."""
    import __spark_entry__ as e
    from medallion_delta_lake_spark.plans import registry

    missing = [k for k in e._DRIVER_PRIORITY if k not in registry.QUERIES]
    assert not missing, missing
    assert list(e.queries())[: len(e._DRIVER_PRIORITY)] == e._DRIVER_PRIORITY
