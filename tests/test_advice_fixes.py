"""Regression tests for the round-1 ADVICE findings.

Each test pins the exact failure mode the advisor verified:
1. dot_product(exact=True) decimal accumulator type mismatch.
2. nn_assign NULL distance winning over real neighbors.
3. nn_assign collapsing exact-duplicate unlabeled rows.
4. _upsert_parquet_snapshot crash-safety (stale dirs, mid-swap crash).
5. dedup_source_by_key partition/order-dependent winner.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from medallion_delta_lake_spark.operators import joins, upsert

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def test_dot_product_exact_path(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        dot_product("a", "b", exact=True).alias("dp"),
        l2_norm("a", exact=True).alias("na"),
        cosine_similarity("a", "b", exact=True).alias("cos"),
    ).first()
    assert row.dp == 32.0
    assert abs(row.na - 14.0**0.5) < 1e-12
    expected = 32.0 / (14.0**0.5 * 77.0**0.5)
    assert abs(row.cos - expected) < 1e-12


def test_dot_product_exact_matches_float_path(spark):
    df = spark.createDataFrame(
        [([0.1] * 64, [0.25] * 64)], "a array<double>, b array<double>"
    )
    row = df.select(
        dot_product("a", "b", exact=True).alias("e"),
        dot_product("a", "b").alias("f"),
    ).first()
    assert abs(row.e - row.f) < 1e-9


def test_nn_assign_null_distance_ranks_last(spark):
    unlabeled = spark.createDataFrame([(1, 10.0)], "uid int, x double")
    labeled = spark.createDataFrame(
        [(100, None), (200, 10.5)], "lab int, y double"
    )
    out = joins.nn_assign(
        unlabeled,
        labeled,
        F.abs(F.col("x") - F.col("y")),
        id_cols=["uid"],
        label_cols=["lab"],
        tie_break=["lab"],
        distance_col="d",
    ).collect()
    assert len(out) == 1
    # the NULL-distance label (100) must not beat the real 0.5 neighbor
    assert out[0].lab == 200 and abs(out[0].d - 0.5) < 1e-12


def test_nn_assign_all_null_distance_keeps_row(spark):
    unlabeled = spark.createDataFrame([(1, 10.0)], "uid int, x double")
    labeled = spark.createDataFrame([(100, None)], "lab int, y double")
    out = joins.nn_assign(
        unlabeled,
        labeled,
        F.abs(F.col("x") - F.col("y")),
        id_cols=["uid"],
        label_cols=["lab"],
        distance_col="d",
    ).collect()
    assert len(out) == 1 and out[0].lab == 100 and out[0].d is None


def test_nn_assign_preserves_duplicate_feature_rows(spark):
    # two distinct ids with identical features must both survive
    unlabeled = spark.createDataFrame(
        [(1, 10.0), (2, 10.0)], "uid int, x double"
    )
    labeled = spark.createDataFrame([(100, 10.5)], "lab int, y double")
    out = joins.nn_assign(
        unlabeled,
        labeled,
        F.abs(F.col("x") - F.col("y")),
        id_cols=["uid"],
        label_cols=["lab"],
    )
    rows = sorted((r.uid, r.lab, r.x) for r in out.collect())
    assert rows == [(1, 100, 10.0), (2, 100, 10.0)]


def test_upsert_snapshot_survives_stale_dirs(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    upsert.upsert(spark, df1, path, keys=["k"])
    # leftover dirs from a hypothetical aborted run
    os.makedirs(path + "__staging/junk", exist_ok=True)
    os.makedirs(path + "__old/junk", exist_ok=True)
    df2 = spark.createDataFrame([(1, "a2"), (3, "c")], "k int, v string")
    upsert.upsert(spark, df2, path, keys=["k"])
    state = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert state == {(1, "a2"), (3, "c")}
    assert not os.path.exists(path + "__staging")
    assert not os.path.exists(path + "__old")


def test_upsert_snapshot_recovers_mid_swap_crash(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a")], "k int, v string")
    upsert.upsert(spark, df1, path, keys=["k"])
    # simulate a crash between the two renames: table parked at __old
    os.rename(path, path + "__old")
    assert not os.path.exists(path)
    df2 = spark.createDataFrame([(1, "a2"), (2, "b")], "k int, v string")
    upsert.upsert(spark, df2, path, keys=["k"])
    state = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert state == {(1, "a2"), (2, "b")}


def test_dedup_source_by_key_deterministic(spark):
    rows = [(1, "x", 5.0), (1, "z", 1.0), (1, "y", 9.0), (2, "q", 0.0)]
    base = spark.createDataFrame(rows, "k int, s string, v double")
    expected = {(1, "z", 1.0), (2, "q", 0.0)}  # max by (s, v) tuple desc
    for df in (base, base.orderBy(F.col("v")), base.repartition(7, "v")):
        got = {
            tuple(r) for r in upsert.dedup_source_by_key(df, ["k"]).collect()
        }
        assert got == expected


def test_dedup_source_by_key_version_col_ties_deterministic(spark):
    rows = [(1, 10, "b"), (1, 10, "a"), (1, 9, "zzz")]
    df = spark.createDataFrame(rows, "k int, ver int, s string")
    got = upsert.dedup_source_by_key(df, ["k"], version_col="ver").collect()
    assert [tuple(r) for r in got] == [(1, 10, "b")]
