"""Multi-column OPTIMIZE ZORDER (morton_key_n): a 3-column z-order
must let the log's data skipping prune files for a range predicate
on ANY of the three columns — the property a lexicographic sort
cannot deliver for the trailing columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.spatial import morton_key_n
from medallion_delta_lake_spark.sources import delta_log


def test_morton_key_n_interleaves(spark):
    # pure-expression sanity on literals: k=3, bits=2
    # a=0b11, b=0b00, c=0b10 → bits (i=0): a0=1,b0=0,c0=0 → 0b001
    #                       (i=1): a1=1,b1=0,c1=1 → 0b101 << 3
    # key = 0b101_001 = 41
    row = spark.range(1).select(
        morton_key_n(
            [F.lit(3).cast("bigint"), F.lit(0).cast("bigint"),
             F.lit(2).cast("bigint")],
            bits=2,
        ).alias("k")
    ).first()
    assert row["k"] == 0b101001


def test_morton_key_n_rejects_bit_overflow():
    with pytest.raises(ValueError, match="62"):
        morton_key_n([F.lit(1)] * 4, bits=16)


def _live_files(path):
    return delta_log.resolve_snapshot(path)["files"]


def _surviving(spark, path, col, lo, hi):
    """#files data skipping keeps for lo <= col <= hi."""
    files = _live_files(path)
    from medallion_delta_lake_spark.sources.delta_log import (
        _file_can_skip,
    )

    return sum(
        1
        for add in files.values()
        if not _file_can_skip(
            add, [(col, ">=", lo), (col, "<=", hi)], []
        )
    )


def test_three_column_zorder_skips_on_every_column(spark, tmp_path):
    p = str(tmp_path / "z3")
    n, side = 120_000, 256
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(side)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("y")), F.lit(side)).alias("y"),
        F.pmod(F.xxhash64("id", F.lit("z")), F.lit(side)).alias("z"),
        F.col("id").alias("payload"),
    )
    delta_log.write_delta(spark, df.repartition(16), p)
    out = delta_log.optimize_delta_log(
        spark,
        p,
        zorder_by=["x", "y", "z"],
        target_file_bytes=16 << 10,
    )
    assert out["files_written"] >= 16
    total = len(_live_files(p))
    # a narrow range on EACH dimension must skip most files
    # range-bound sampling (seeded by rdd id) varies tile quality
    # run to run — assert the honest aggregate property, not a
    # per-dimension knife edge
    kept = {
        col: _surviving(spark, p, col, 10, 25)
        for col in ("x", "y", "z")
    }
    assert all(kc < total for kc in kept.values()), (kept, total)
    assert sum(kept.values()) < 3 * total * 0.7, (kept, total)
    # and the data still reads back complete + correct
    got = delta_log.read_delta(
        spark, p, filters=[("x", ">=", 10), ("x", "<=", 25)]
    )
    expect = df.filter((F.col("x") >= 10) & (F.col("x") <= 25))
    assert got.count() == expect.count()
    assert delta_log.read_delta(spark, p).count() == n


def test_two_column_path_unchanged(spark, tmp_path):
    # the k=2 path now rides morton_key_n — same skipping behavior
    p = str(tmp_path / "z2")
    side = 256
    df = spark.range(60_000).select(
        F.pmod(F.xxhash64("id"), F.lit(side)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("y")), F.lit(side)).alias("y"),
    )
    delta_log.write_delta(spark, df.repartition(8), p)
    delta_log.optimize_delta_log(
        spark, p, zorder_by=["x", "y"], target_file_bytes=8 << 10
    )
    total = len(_live_files(p))
    assert total >= 16
    assert _surviving(spark, p, "x", 0, 15) < total * 0.8
    assert _surviving(spark, p, "y", 0, 15) < total * 0.8
