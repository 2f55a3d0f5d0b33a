"""Delta type widening (typeWidening table feature,
delta_log.alter_column_type): metadata-only widen, mixed narrow/wide
file reads, typeChanges history, protocol adoption, refusals, data
skipping across the change, and the Python DataSource face."""

from __future__ import annotations

import json

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from pyspark.sql.types import StructType

from medallion_delta_lake_spark.sources import delta_log


def _mk(spark, tmp_path, name="t"):
    p = str(tmp_path / name)
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(1, 10, 1.5), (2, 20, 2.5)], "k int, v int, f float"
        ).coalesce(1),
        p,
    )
    return p


def _schema(p) -> StructType:
    meta = delta_log.resolve_snapshot(p)["meta"]
    return StructType.fromJson(json.loads(meta["schemaString"]))


def test_widen_int_to_long_reads_old_and_new_files(spark, tmp_path):
    p = _mk(spark, tmp_path)
    delta_log.alter_column_type(p, "v", "long")
    assert _schema(p)["v"].dataType.simpleString() == "bigint"
    # append a value only a long can hold — old files stay int32
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(3, 5_000_000_000, 3.5)], "k int, v long, f float"
        ).coalesce(1),
        p,
    )
    got = delta_log.read_delta(spark, p)
    assert dict(got.dtypes)["v"] == "bigint"
    assert {(r["k"], r["v"]) for r in got.collect()} == {
        (1, 10),
        (2, 20),
        (3, 5_000_000_000),
    }


def test_widen_float_to_double_and_decimal_growth(spark, tmp_path):
    import decimal

    p = str(tmp_path / "d")
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(1, decimal.Decimal("12.34"))], "k int, d decimal(6,2)"
        ).coalesce(1),
        p,
    )
    delta_log.alter_column_type(p, "d", "decimal(12,4)")
    p2 = _mk(spark, tmp_path, "f")
    delta_log.alter_column_type(p2, "f", "double")
    assert {
        str(r["d"]) for r in delta_log.read_delta(spark, p).collect()
    } == {"12.3400"}
    rows = {
        (r["k"], r["f"])
        for r in delta_log.read_delta(spark, p2).collect()
    }
    assert rows == {(1, 1.5), (2, 2.5)}


def test_type_changes_history_stamps_commit_versions(spark, tmp_path):
    p = _mk(spark, tmp_path)
    v1 = delta_log.alter_column_type(p, "v", "long")  # int → long
    # a second widening on the same column appends, not replaces
    v2 = delta_log.alter_column_type(p, "v", "decimal(22,1)")
    md = _schema(p)["v"].metadata
    changes = md["delta.typeChanges"]
    assert [
        (c["fromType"], c["toType"], c["tableVersion"]) for c in changes
    ] == [("int", "bigint", v1), ("bigint", "decimal(22,1)", v2)]


def test_protocol_adopts_reader_and_writer_feature(spark, tmp_path):
    p = _mk(spark, tmp_path)
    delta_log.alter_column_type(p, "v", "long")
    proto = delta_log.resolve_snapshot(p)["protocol"]
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "typeWidening" in proto["readerFeatures"]
    assert "typeWidening" in proto["writerFeatures"]
    # date → timestamp_ntz additionally adopts timestampNtz
    import datetime

    p2 = str(tmp_path / "dt")
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(1, datetime.date(2024, 1, 2))], "k int, dt date"
        ).coalesce(1),
        p2,
    )
    delta_log.alter_column_type(p2, "dt", "timestamp_ntz")
    proto2 = delta_log.resolve_snapshot(p2)["protocol"]
    assert "timestampNtz" in proto2["readerFeatures"]
    got = delta_log.read_delta(spark, p2).collect()
    assert got[0]["dt"] == datetime.datetime(2024, 1, 2)


@pytest.mark.parametrize(
    "col,target",
    [
        ("v", "int"),  # same type: not a widening
        ("v", "short"),  # narrowing
        ("v", "string"),  # unrelated
        ("f", "decimal(20,4)"),  # float→decimal unsupported
        ("v", "decimal(9,0)"),  # p−s < 10 can't hold every int32
    ],
)
def test_refuses_non_widenings(spark, tmp_path, col, target):
    p = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not a supported widening"):
        delta_log.alter_column_type(p, col, target)


def test_refuses_partition_and_identity_columns(spark, tmp_path):
    p = str(tmp_path / "pt")
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(1, 10)], "k int, v int").coalesce(1),
        p,
        partition_by=["k"],
    )
    with pytest.raises(ValueError, match="partition column"):
        delta_log.alter_column_type(p, "k", "long")
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
    )

    from medallion_delta_lake_spark.sources import identity

    p2 = str(tmp_path / "it")
    identity.create_identity_table(
        spark,
        p2,
        StructType([StructField("v", IntegerType())]),
        "id",
    )
    with pytest.raises(ValueError, match="IDENTITY"):
        delta_log.alter_column_type(p2, "id", "decimal(22,0)")
    # the decimal→double trap (Spark's scan returns the unscaled int)
    p3 = str(tmp_path / "dd")
    import decimal

    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(decimal.Decimal("12.34"),)], "d decimal(6,2)"
        ).coalesce(1),
        p3,
    )
    with pytest.raises(ValueError, match="not a supported widening"):
        delta_log.alter_column_type(p3, "d", "double")


def test_narrow_appends_refused_after_widen(spark, tmp_path):
    p = _mk(spark, tmp_path)
    delta_log.alter_column_type(p, "v", "long")
    with pytest.raises(delta_log.DeltaSchemaMismatchError):
        delta_log.write_delta(
            spark,
            spark.createDataFrame(
                [(9, 9, 9.5)], "k int, v int, f float"
            ).coalesce(1),
            p,
        )


def test_data_skipping_survives_the_widen(spark, tmp_path):
    p = str(tmp_path / "skip")
    for lo in (0, 1000):
        delta_log.write_delta(
            spark,
            spark.createDataFrame(
                [(i,) for i in range(lo, lo + 10)], "v int"
            ).coalesce(1),
            p,
            mode="append" if lo else "overwrite",
        )
    delta_log.alter_column_type(p, "v", "long")
    # stats in the log were written for int values; a long-typed
    # filter must still skip the non-matching file and return the
    # right rows
    got = delta_log.read_delta(
        spark, p, filters=[("v", ">=", 1005)]
    )
    assert sorted(r["v"] for r in got.collect()) == list(
        range(1005, 1010)
    )


def test_python_datasource_reads_widened_table(spark, tmp_path):
    from medallion_delta_lake_spark.sources import (
        python_datasource as pds,
    )

    p = _mk(spark, tmp_path)
    delta_log.alter_column_type(p, "v", "long")
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(3, 6_000_000_000, 0.5)], "k int, v long, f float"
        ).coalesce(1),
        p,
    )
    pds.register(spark)
    back = (
        spark.read.format(pds.FORMAT_NAME).option("path", p).load()
    )
    assert dict(back.dtypes)["v"] == "bigint"
    assert {r["v"] for r in back.collect()} == {10, 20, 6_000_000_000}
