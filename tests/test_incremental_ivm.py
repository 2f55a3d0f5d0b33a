"""Edge-case contract for operators/incremental.py:apply_changes_to_agg
(the r10 CDC consumer; the update/merge mainline is pinned by
tests/test_cdc_write.py::test_incremental_agg_maintenance): group
DEATH (count hits zero → group vanishes, exactly like a
re-aggregation), group BIRTH, and an empty feed as identity."""

from __future__ import annotations

from pyspark.sql import functions as F


def _apply(spark, stored, rows):
    from medallion_delta_lake_spark.operators.incremental import (
        apply_changes_to_agg,
    )

    changes = spark.createDataFrame(
        rows, "k string, v double, _change_type string"
    )
    return apply_changes_to_agg(stored, changes, ["k"], ["v"])


def _rollup(df):
    from medallion_delta_lake_spark.operators.incremental import (
        aggregate_table,
    )

    return aggregate_table(df, ["k"], ["v"])


def test_group_birth_and_death(spark):
    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0), ("c", 7.0)],
        "k string, v double",
    )
    stored = _rollup(base)
    rows = [
        ("a", 10.0, "delete"),
        ("b", 5.0, "update_preimage"),
        ("b", 9.0, "update_postimage"),
        ("a", 100.0, "insert"),
        ("d", 1.0, "insert"),  # birth
        ("c", 7.0, "delete"),  # death
    ]
    got = {
        r.k: (r.n, float(r.sum_v))
        for r in _apply(spark, stored, rows).collect()
    }
    final = spark.createDataFrame(
        [("a", 20.0), ("a", 100.0), ("b", 9.0), ("d", 1.0)],
        "k string, v double",
    )
    want = {
        r.k: (r.n, float(r.sum_v)) for r in _rollup(final).collect()
    }
    assert got == want
    assert "c" not in got


def test_empty_feed_is_identity(spark):
    base = spark.createDataFrame(
        [("a", 10.0), ("b", 5.0)], "k string, v double"
    )
    stored = _rollup(base)
    got = {
        r.k: (r.n, float(r.sum_v))
        for r in _apply(spark, stored, []).collect()
    }
    want = {r.k: (r.n, float(r.sum_v)) for r in stored.collect()}
    assert got == want
