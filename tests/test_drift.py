"""Operator-level edges for the drift-monitor family — crafted
micro-cases beyond what the registered oracle queries reach: exact
hand-computed distances, identical/disjoint extremes, out-of-range
clamping, and the degenerate single-value reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import drift


def _tv(spark, rows, bins=4):
    df = spark.createDataFrame(rows, "x double, cur boolean")
    return drift.binned_total_variation(df, "x", "cur", bins=bins)


def test_tv_identical_distributions_is_zero(spark):
    rows = [(float(i % 10), c) for i in range(40) for c in (False, True)]
    out = _tv(spark, rows).collect()
    assert all(r["tv_distance"] == 0.0 for r in out)
    assert all(r["gap"] == 0.0 for r in out)
    assert all(r["ref_cnt"] == r["cur_cnt"] for r in out)


def test_tv_out_of_range_current_clamps_high(spark):
    # ref splits 5/5 between buckets 0 and 3 (the ref max always lands
    # in the top bucket); current is all out-of-range high and clamps
    # into bucket 3: TV = 0.5·(|0−.5| + |1−.5|) = 0.5 exactly
    rows = [(0.0, False)] * 5 + [(1.0, False)] * 5 + [(99.0, True)] * 7
    out = {r["bin"]: r for r in _tv(spark, rows).collect()}
    assert out[3]["cur_cnt"] == 7 and out[3]["ref_cnt"] == 5
    assert out[0]["gap"] == 0.5 and out[3]["gap"] == 0.5
    assert out[0]["tv_distance"] == 0.5


def test_tv_hand_computed(spark):
    # ref: 4 rows in [0,1) bucket0, 4 in bucket3; cur: 2 and 6.
    # edges from ref min 0 max 4, width 1. TV = 0.5*(|2/8-4/8|+|6/8-4/8|)
    rows = (
        [(0.5, False)] * 4
        + [(3.5, False)] * 4
        + [(0.5, True)] * 2
        + [(3.5, True)] * 6
    )
    out = {r["bin"]: r for r in _tv(spark, rows).collect()}
    assert out[0]["gap"] == 0.25 and out[3]["gap"] == 0.25
    assert out[0]["tv_distance"] == 0.25


def test_tv_below_range_clamps_to_bucket_zero(spark):
    rows = [(10.0, False), (20.0, False), (-5.0, True), (15.0, True)]
    out = {r["bin"]: r for r in _tv(spark, rows, bins=2).collect()}
    assert out[0]["cur_cnt"] == 1  # -5 clamped up into bucket 0


def test_tv_degenerate_single_value_reference(spark):
    # mx == mn: everything lands in bucket 0, TV reduces to 0
    rows = [(7.0, False)] * 3 + [(7.0, True)] * 5
    out = _tv(spark, rows).collect()
    assert len(out) == 1
    assert out[0]["bin"] == 0 and out[0]["tv_distance"] == 0.0


def test_bhattacharyya_identical_mix(spark):
    rows = [(c, cur) for c in "aabbc" for cur in (False, True)]
    df = spark.createDataFrame(rows, "cat string, cur boolean")
    r = drift.categorical_bhattacharyya(df, "cat", "cur").first()
    assert r["bhattacharyya"] == 1.0
    assert r["hellinger"] == 0.0
    assert r["n_categories"] == 3
    assert r["n_ref"] == 5 and r["n_cur"] == 5


def test_bhattacharyya_disjoint_mix(spark):
    rows = [("a", False), ("b", False), ("c", True), ("d", True)]
    df = spark.createDataFrame(rows, "cat string, cur boolean")
    r = drift.categorical_bhattacharyya(df, "cat", "cur").first()
    assert r["bhattacharyya"] == 0.0
    assert r["hellinger"] == 1.0
    assert r["n_categories"] == 4


def test_bhattacharyya_hand_computed(spark):
    # ref: a×1 b×1; cur: a×1 b×3 → bc = sqrt(.5*.25)+sqrt(.5*.75)
    rows = [("a", False), ("b", False), ("a", True)] + [("b", True)] * 3
    df = spark.createDataFrame(rows, "cat string, cur boolean")
    r = drift.categorical_bhattacharyya(df, "cat", "cur").first()
    expected = (0.5 * 0.25) ** 0.5 + (0.5 * 0.75) ** 0.5
    assert abs(r["bhattacharyya"] - expected) < 1e-15


def test_drift_ops_no_wide_shuffle(spark):
    # scale shape: the data-sized side of both plans is a single scan
    # into a map-side-combined aggregate; no join of two full scans
    df = spark.range(1000).select(
        (F.col("id") % 13).cast("double").alias("x"),
        (F.col("id") % 2 == 0).alias("cur"),
    )
    plan = drift.binned_total_variation(
        df, "x", "cur"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # scalar edge broadcast
    assert "SortMergeJoin" not in plan
