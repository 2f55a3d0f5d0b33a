"""Contract tests for the Delta-native code path.

This container has no delta-spark, so the native branch
(operators/upsert.py::_upsert_delta, sources/writers.py delta format
selection) is dead code here — these tests make that explicit instead
of silent: they run (and gate regressions) in any environment where
delta-spark IS importable, and show up as SKIPPED, not missing, in
this one. The parquet-fallback twin of every behavior is covered by
tests/test_upsert.py / test_advice_fixes.py / test_advice_r2.py.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import upsert
from medallion_delta_lake_spark.session import delta_available
from medallion_delta_lake_spark.sources import writers

delta_only = pytest.mark.skipif(
    not delta_available(),
    reason="delta-spark not installed in this environment; "
    "the native MERGE branch is exercised via its parquet-snapshot "
    "twin (merge_state) instead",
)


@delta_only
def test_delta_upsert_scd1_update_insert_delete(spark, tmp_path):
    path = str(tmp_path / "dtbl")
    t1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    upsert.upsert(spark, t1, path, keys=["k"])
    # update 1, drop 2, insert 3 — full-source sync
    t2 = spark.createDataFrame([(1, "a2"), (3, "c")], "k int, v string")
    upsert.upsert(spark, t2, path, keys=["k"])
    got = {
        (r.k, r.v)
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got == {(1, "a2"), (3, "c")}


@delta_only
def test_delta_upsert_null_safe_change_detection(spark, tmp_path):
    # NULL -> value and value -> NULL must both count as changes
    # (the reference's != condition silently skipped them — quirk Q3)
    path = str(tmp_path / "dtbl")
    t1 = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    upsert.upsert(spark, t1, path, keys=["k"], delete_missing=False)
    t2 = spark.createDataFrame([(1, "now"), (2, None)], "k int, v string")
    upsert.upsert(spark, t2, path, keys=["k"], delete_missing=False)
    got = {
        (r.k, r.v)
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got == {(1, "now"), (2, None)}


@delta_only
def test_delta_append_merge_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "dtbl")
    writers.write_append(
        spark.createDataFrame([(1,)], "k int"), path, merge_schema=True
    )
    writers.write_append(
        spark.createDataFrame([(2, "new")], "k int, extra string"),
        path,
        merge_schema=True,
    )
    df = spark.read.format("delta").load(path)
    assert set(df.columns) == {"k", "extra"}
    assert df.filter(F.col("extra").isNull()).count() == 1


def test_parquet_fallback_is_active_here(spark):
    """Pin the environment assumption the module documents: if this
    starts failing, delta-spark appeared and the skips above now run."""
    assert not delta_available()
