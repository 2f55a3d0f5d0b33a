"""Regression tests for the round-3 ADVICE items (see ADVICE.md):
delete_keys must self-heal a crashed swap before its first read;
salted_join must reject join types its salting cannot preserve;
incremental dedup's within-batch mode is covered in
tests/test_incremental_dedup.py and scoped caching in
tests/test_advice_r2.py + conftest.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import skew, upsert


def test_delete_keys_recovers_crashed_swap(spark, tmp_path):
    # build a table, then simulate a crash that died between the two
    # swap renames: path is gone, __old holds the data
    path = str(tmp_path / "tbl")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    df.write.parquet(path)
    os.rename(path, path + "__old")
    assert not os.path.exists(path)

    keys_df = spark.range(10).select(F.col("id").alias("k"))
    removed = upsert.delete_keys(spark, path, keys_df, ["k"])
    assert removed == 10
    assert not os.path.exists(path + "__old")
    assert spark.read.parquet(path).count() == 90


def test_salted_join_rejects_right_and_full(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    for how in ("right", "full_outer", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            skew.salted_join(df, df, ["k"], how=how)


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.range(20).select(F.col("id").alias("k"))
    right = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1).alias("tag")
    )
    out = skew.salted_join(left, right, ["k"], salt_buckets=4, how="left")
    assert out.count() == 20
    assert out.filter(F.col("tag").isNull()).count() == 10
