"""Semi-structured VARIANT operators (operators/variant_ops.py,
pre-built r10): shredding to typed columns, key census as a drift
monitor, and per-path type profiles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from medallion_delta_lake_spark.operators import variant_ops as vo

PAYLOADS = [
    (1, '{"user": {"id": 7, "name": "ann"}, "amount": 12, "ok": true}'),
    (2, '{"user": {"id": 8}, "amount": 34, "extra": [1, 2]}'),
    (3, '{"user": {"id": 9}, "amount": "oops", "ok": false}'),
]


@pytest.fixture(scope="module")
def vdf(spark):
    return spark.createDataFrame(
        PAYLOADS, "k long, j string"
    ).select("k", F.parse_json("j").alias("payload"))


def test_shred_promotes_typed_columns(spark, vdf):
    out = vo.shred_variant(
        vdf,
        "payload",
        {
            "user_id": ("$.user.id", "long"),
            "amount": ("$.amount", "long"),
            "ok": ("$.ok", "boolean"),
        },
    )
    assert dict(out.dtypes) == {
        "k": "bigint",
        "user_id": "bigint",
        "amount": "bigint",
        "ok": "boolean",
    }
    rows = {r["k"]: (r["user_id"], r["amount"], r["ok"])
            for r in out.collect()}
    assert rows[1] == (7, 12, True)
    assert rows[2] == (8, 34, None)  # absent path → NULL
    assert rows[3] == (9, None, False)  # miscast → NULL (try mode)


def test_shred_strict_fails_on_miscast(spark, vdf):
    out = vo.shred_variant(
        vdf, "payload", {"amount": ("$.amount", "long")}, strict=True
    )
    with pytest.raises(Exception):  # "oops" cannot cast to long
        out.collect()
    # strict succeeds when every value conforms
    ok = vo.shred_variant(
        vdf.filter(F.col("k") < 3),
        "payload",
        {"amount": ("$.amount", "long")},
        strict=True,
    )
    assert sorted(r["amount"] for r in ok.collect()) == [12, 34]


def test_key_census_counts_and_types(spark, vdf):
    got = {
        r["key"]: (r["n_rows"], r["n_nonnull"], r["type_sample"])
        for r in vo.variant_key_census(vdf, "payload").collect()
    }
    assert got["user"][0] == 3 and got["user"][1] == 3
    assert got["amount"][0] == 3
    assert got["ok"] == (2, 2, "BOOLEAN")
    assert got["extra"][0] == 1
    assert "ARRAY" in got["extra"][2]


def test_type_profile_quantifies_drift(spark, vdf):
    got = {
        (r["path"], r["variant_type"]): r["n"]
        for r in vo.variant_type_profile(
            vdf, "payload", ["$.amount", "$.user.id"]
        ).collect()
    }
    assert got[("$.amount", "BIGINT")] == 2
    assert got[("$.amount", "STRING")] == 1  # the "oops" row
    assert got[("$.user.id", "BIGINT")] == 3


def test_shred_keep_variant_retains_column(spark, vdf):
    out = vo.shred_variant(
        vdf,
        "payload",
        {"amount": ("$.amount", "long")},
        keep_variant=True,
    )
    assert "payload" in out.columns
    assert dict(out.dtypes)["payload"] == "variant"
