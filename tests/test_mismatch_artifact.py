"""Forced-mismatch evidence: compare_query must persist a
MISMATCH_<op>.json artifact with both engines' differing rows, so a
driver hash-red is diagnosable even when it doesn't reproduce later
(VERDICT r8 missing #1)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from tests.oracle import MISMATCH_DIR, compare_query


def _cleanup(name: str):
    p = MISMATCH_DIR / f"MISMATCH_{name}.json"
    if p.exists():
        p.unlink()


def test_hash_mismatch_writes_artifact(spark):
    name = "__forced_hash_mismatch__"
    _cleanup(name)
    queries = {
        name: lambda sp, sf: sp.range(3).select(
            F.col("id").cast("bigint").alias("id"),
            (F.col("id") * 2).cast("bigint").alias("v"),
        )
    }
    oracles = {name: "SELECT CAST(r AS BIGINT) AS id, CAST(r * 3 AS BIGINT) AS v FROM range(3) t(r)"}
    with pytest.raises(AssertionError, match="row mismatches"):
        compare_query(spark, name, queries, oracles, SF_ORACLE)
    p = MISMATCH_DIR / f"MISMATCH_{name}.json"
    assert p.exists()
    d = json.loads(p.read_text())
    assert d["kind"] == "hash"
    assert d["op"] == name
    assert d["spark_only"] and d["oracle_only"]
    # rows with id=0 agree (0*2 == 0*3); ids 1,2 differ in v
    assert len(d["spark_only"]) == 2
    assert [1, 2] in d["spark_only"]
    assert [1, 3] in d["oracle_only"]
    _cleanup(name)


def test_rowcount_mismatch_writes_artifact(spark):
    name = "__forced_rowcount_mismatch__"
    _cleanup(name)
    queries = {
        name: lambda sp, sf: sp.range(2).select(
            F.col("id").cast("bigint").alias("id")
        )
    }
    oracles = {name: "SELECT CAST(r AS BIGINT) AS id FROM range(5) t(r)"}
    with pytest.raises(AssertionError, match="row count"):
        compare_query(spark, name, queries, oracles, SF_ORACLE)
    d = json.loads((MISMATCH_DIR / f"MISMATCH_{name}.json").read_text())
    assert d["kind"] == "rows"
    assert d["oracle_only"]  # the 3 extra oracle rows are in evidence
    _cleanup(name)


def test_green_query_writes_no_artifact(spark):
    name = "__forced_green__"
    _cleanup(name)
    queries = {
        name: lambda sp, sf: sp.range(4).select(
            F.col("id").cast("bigint").alias("id")
        )
    }
    oracles = {name: "SELECT CAST(r AS BIGINT) AS id FROM range(4) t(r)"}
    compare_query(spark, name, queries, oracles, SF_ORACLE)
    assert not (MISMATCH_DIR / f"MISMATCH_{name}.json").exists()
