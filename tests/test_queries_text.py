"""Oracle-parity tests for the text-analysis / text-dedup query surface
(queries_text.py), run at sf0.001."""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.plans import queries_text  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

TEXT_IDS = sorted(
    n for n in QUERIES if n in ORACLES and n.startswith(("text-", "dedup-minhash",
                                                         "dedup-simhash",
                                                         "dedup-ngram",
                                                         "dedup-exact"))
)


@pytest.mark.parametrize("name", TEXT_IDS)
def test_text_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)
