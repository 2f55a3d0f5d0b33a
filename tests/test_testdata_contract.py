"""Post-normalization schema contract over the driver testdata.

Round 4 lost its whole bench artifact because the testdata regenerated
with a new physical encoding for ``events.ts`` and the break surfaced
three layers downstream (watermark analysis errors in three streaming
queries). This test pins the contract at the right layer instead: for
every table, whatever the parquet's physical types are, the frame
``registry.table()`` hands to the plans must have these logical types.
If a regeneration drifts again, THIS fails first, naming the column —
extend ``registry._normalize_event_time`` (or add a sibling
normalizer), not the downstream call sites.
"""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.plans.registry import table
from tests.conftest import SF_SMOKE

# column → set of acceptable post-normalization Spark dtypes. Numeric
# width (int vs bigint, float vs double) is allowed to drift — plans
# cast at use sites; type *class* changes (string/timestamp/array) and
# the watermark-hostile timestamp_ntz are what must not leak through.
_NUMERIC = {"int", "bigint", "smallint", "tinyint"}
_FLOATING = {"float", "double"}

CONTRACT = {
    "events": {
        "event_id": _NUMERIC,
        "user_id": _NUMERIC,
        "event_type": {"string"},
        "ts": {"timestamp"},  # NEVER timestamp_ntz / bigint after table()
        "value": _FLOATING,
    },
    "documents": {
        "doc_id": _NUMERIC,
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
    },
    "embeddings": {
        "vec_id": _NUMERIC,
        "embedding": {"array<float>", "array<double>"},
    },
    # date columns tolerate timestamp_ntz: no batch plan watermarks
    # them, and the DuckDB oracle's timestamps are equally naive. Only
    # the streaming event-time column must be a true TIMESTAMP.
    "lineitem": {
        "l_orderkey": _NUMERIC,
        "l_quantity": _FLOATING | {"decimal(15,2)", "decimal(12,2)"},
        "l_shipdate": {"date", "timestamp", "timestamp_ntz"},
    },
    "orders": {
        "o_orderkey": _NUMERIC,
        "o_orderdate": {"date", "timestamp", "timestamp_ntz"},
        "o_totalprice": _FLOATING | {"decimal(15,2)", "decimal(12,2)"},
    },
    "customer": {"c_custkey": _NUMERIC, "c_mktsegment": {"string"}},
    "supplier": {"s_suppkey": _NUMERIC, "s_acctbal": _FLOATING},
    "part": {"p_partkey": _NUMERIC, "p_brand": {"string"}},
    "nation": {"n_nationkey": _NUMERIC, "n_name": {"string"}},
    "region": {"r_regionkey": _NUMERIC, "r_name": {"string"}},
}


@pytest.mark.parametrize("name", sorted(CONTRACT))
def test_table_schema_contract(spark, name):
    dtypes = dict(table(spark, SF_SMOKE, name).dtypes)
    for col, allowed in CONTRACT[name].items():
        assert col in dtypes, f"{name}.{col} missing (have {sorted(dtypes)})"
        assert dtypes[col] in allowed, (
            f"{name}.{col} is {dtypes[col]!r}, contract allows {sorted(allowed)} "
            "— the testdata encoding drifted; extend the normalizer in "
            "plans/registry.py"
        )
