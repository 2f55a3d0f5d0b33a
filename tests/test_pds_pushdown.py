"""Filter pushdown for the mdls_delta Python DataSource
(_PushdownBatchReader): stats/partition file skipping, the
yield-everything-back safety contract, and the option gating that
keeps default reads working while
spark.sql.python.filterPushdown.enabled defaults to false."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
)
from pyspark.sql.types import StructType

from medallion_delta_lake_spark.sources import delta_log
from medallion_delta_lake_spark.sources import (
    python_datasource as pds,
)


def _two_file_table(spark, tmp_path):
    p = str(tmp_path / "t")
    for lo in (0, 1000):
        delta_log.write_delta(
            spark,
            spark.createDataFrame(
                [(i, f"r{i}") for i in range(lo, lo + 10)],
                "v long, s string",
            ).coalesce(1),
            p,
            mode="append" if lo else "overwrite",
        )
    return p


def test_reader_prunes_files_by_stats(spark, tmp_path):
    p = _two_file_table(spark, tmp_path)
    schema = delta_log.read_delta(spark, p).schema
    r = pds._PushdownBatchReader(
        {"path": p, "pushdown": "true"}, schema
    )
    assert len(r.partitions()) == 2  # no filters yet
    flt = [GreaterThanOrEqual(("v",), 1005), IsNotNull(("s",))]
    back = list(r.pushFilters(flt))
    assert back == flt  # EVERYTHING yielded back — pruning only
    assert len(r.partitions()) == 1  # the 0..9 file skipped


def test_end_to_end_pushdown_results_match(spark, tmp_path):
    p = _two_file_table(spark, tmp_path)
    pds.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format(pds.FORMAT_NAME)
            .option("path", p)
            .option("pushdown", "true")
            .load()
            .filter(F.col("v") >= 1005)
        )
        assert sorted(r["v"] for r in got.collect()) == list(
            range(1005, 1010)
        )
        # a filter the skipper can't use (inequality) stays correct
        got2 = (
            spark.read.format(pds.FORMAT_NAME)
            .option("path", p)
            .option("pushdown", "true")
            .load()
            .filter(F.col("v") != 3)
        )
        assert got2.count() == 19
    finally:
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", "false"
        )


def test_default_reader_stays_pushdown_free(spark, tmp_path):
    # with the session conf at its default (false), a reader that
    # overrides pushFilters would make Spark FAIL the query — the
    # default path must therefore not override it
    assert "pushFilters" not in vars(pds._BatchReader)
    p = _two_file_table(spark, tmp_path)
    pds.register(spark)
    got = (
        spark.read.format(pds.FORMAT_NAME)
        .option("path", p)
        .load()
        .filter(F.col("v") >= 1005)
    )
    assert got.count() == 5


def test_partition_value_pruning(spark, tmp_path):
    p = str(tmp_path / "pt")
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(d, i) for d in ("a", "b", "c") for i in range(5)],
            "part string, v long",
        ).repartition("part"),
        p,
        partition_by=["part"],
    )
    schema = delta_log.read_delta(spark, p).schema
    r = pds._PushdownBatchReader(
        {"path": p, "pushdown": "true"}, schema
    )
    n_all = len(r.partitions())
    assert n_all >= 3
    list(r.pushFilters([EqualTo(("part",), "b")]))
    kept = r.partitions()
    assert 0 < len(kept) < n_all
    assert all(
        pp.partition_values.get("part") == "b" for pp in kept
    )
