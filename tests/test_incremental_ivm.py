"""Unit contract for operators/incremental.py — the grouped-additive
incremental view maintenance: maintained state must equal a
from-scratch rollup under inserts, deletes, updates (preimage/
postimage pairs), group birth, and group death; an empty feed is a
no-op."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rollup(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
    )


def _apply(spark, stored, rows):
    from medallion_delta_lake_spark.operators.incremental import (
        grouped_sum_apply_changes,
    )

    changes = spark.createDataFrame(
        rows, "k string, v bigint, _change_type string"
    )
    return grouped_sum_apply_changes(
        stored, changes, ["k"], {"sum_v": "v"}, n_col="n"
    )


def test_matches_rebuild_under_mixed_churn(spark):
    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], "k string, v bigint"
    )
    stored = _rollup(base)
    # delete one 'a' row, update the 'b' row 5→9 (pre+post pair),
    # insert into existing 'a' and brand-new 'd', delete ALL of 'c'
    rows = [
        ("a", 10, "delete"),
        ("b", 5, "update_preimage"),
        ("b", 9, "update_postimage"),
        ("a", 100, "insert"),
        ("d", 1, "insert"),
        ("c", 7, "delete"),
    ]
    got = {r.k: (r.n, r.sum_v) for r in _apply(spark, stored, rows).collect()}
    final = spark.createDataFrame(
        [("a", 20), ("a", 100), ("b", 9), ("d", 1)], "k string, v bigint"
    )
    want = {r.k: (r.n, r.sum_v) for r in _rollup(final).collect()}
    assert got == want
    assert "c" not in got  # group death: count hit zero and vanished


def test_empty_feed_is_identity(spark):
    base = spark.createDataFrame(
        [("a", 10), ("b", 5)], "k string, v bigint"
    )
    stored = _rollup(base)
    got = {r.k: (r.n, r.sum_v) for r in _apply(spark, stored, []).collect()}
    want = {r.k: (r.n, r.sum_v) for r in stored.collect()}
    assert got == want
