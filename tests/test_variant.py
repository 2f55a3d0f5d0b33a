"""VARIANT columns in the log engine (variantType table feature):
creation-time protocol adoption, round-trip through write/read,
schema evolution into a variant column, TIMESTAMP_NTZ adoption, and
the Python DataSource refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_delta_lake_spark.sources import delta_log


def _variant_df(spark, n=3):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.concat(
                F.lit('{"a": '),
                F.col("id").cast("string"),
                F.lit(', "tags": ["x", "y"]}'),
            )
        ).alias("payload"),
    )


def test_create_variant_table_adopts_feature_and_round_trips(
    spark, tmp_path
):
    p = str(tmp_path / "vt")
    delta_log.write_delta(spark, _variant_df(spark).coalesce(1), p)
    proto = delta_log.resolve_snapshot(p)["protocol"]
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    # legacy implied features preserved
    assert "appendOnly" in proto["writerFeatures"]
    back = delta_log.read_delta(spark, p)
    assert dict(back.dtypes)["payload"] == "variant"
    got = {
        (r["k"], r["a"], r["t0"])
        for r in back.select(
            "k",
            F.variant_get("payload", "$.a", "int").alias("a"),
            F.variant_get("payload", "$.tags[0]", "string").alias(
                "t0"
            ),
        ).collect()
    }
    assert got == {(0, 0, "x"), (1, 1, "x"), (2, 2, "x")}


def test_append_and_filter_work_without_file_stats(spark, tmp_path):
    # pyarrow cannot read variant footers → add.stats is None; the
    # filter path must still return exact results (no skipping)
    p = str(tmp_path / "vt2")
    delta_log.write_delta(spark, _variant_df(spark, 4).coalesce(1), p)
    delta_log.write_delta(
        spark,
        _variant_df(spark, 8).filter(F.col("id") >= 4).coalesce(1),
        p,
    )
    got = delta_log.read_delta(spark, p, filters=[("k", ">=", 6)])
    assert sorted(r["k"] for r in got.collect()) == [6, 7]


def test_overwrite_schema_into_variant_upgrades_protocol(
    spark, tmp_path
):
    p = str(tmp_path / "evolve")
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(1, "a")], "k long, s string").coalesce(
            1
        ),
        p,
    )
    assert (
        delta_log.resolve_snapshot(p)["protocol"]["minWriterVersion"]
        == 2
    )
    delta_log.write_delta(
        spark,
        _variant_df(spark).coalesce(1),
        p,
        mode="overwrite",
        overwrite_schema=True,
    )
    proto = delta_log.resolve_snapshot(p)["protocol"]
    assert "variantType" in proto["readerFeatures"]
    assert "appendOnly" in proto["writerFeatures"]  # legacy preserved
    assert delta_log.read_delta(spark, p).count() == 3


def test_timestamp_ntz_creation_adopts_feature(spark, tmp_path):
    import datetime

    p = str(tmp_path / "ntz")
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2, 3, 4, 5))],
        "k long, t timestamp_ntz",
    )
    delta_log.write_delta(spark, df.coalesce(1), p)
    proto = delta_log.resolve_snapshot(p)["protocol"]
    assert "timestampNtz" in proto["readerFeatures"]
    got = delta_log.read_delta(spark, p).collect()
    assert got[0]["t"] == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_python_datasource_refuses_variant_tables(spark, tmp_path):
    from medallion_delta_lake_spark.sources import (
        python_datasource as pds,
    )

    p = str(tmp_path / "vt3")
    delta_log.write_delta(spark, _variant_df(spark).coalesce(1), p)
    pds.register(spark)
    with pytest.raises(Exception, match="VARIANT|variant"):
        (
            spark.read.format(pds.FORMAT_NAME)
            .option("path", p)
            .load()
            .collect()
        )
