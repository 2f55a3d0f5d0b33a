"""Source/sink coverage (SURVEY.md §2.1): CSV scan with declared
schema, JSON wide-map-row melt, append/overwrite/exists write shapes."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from medallion_delta_lake_spark.sources import readers, writers


def test_scan_csv_declared_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,a\n2,b\n")
    schema = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    df = readers.scan_csv(spark, str(p), schema=schema)
    assert df.schema == schema  # no inference pass
    assert {(r.id, r.name) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_scan_csv_infer_fallback(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,a\n")
    df = readers.scan_csv(spark, str(p))
    assert dict(df.dtypes)["id"] == "int"


def test_scan_json_melt_wide_map_row(spark, tmp_path):
    p = tmp_path / "map.json"
    p.write_text(json.dumps({"0": "Alpha", "1": "Beta", "12": "Omega"}))
    wide = readers.scan_json(spark, str(p))
    melted = readers.melt_wide_map_row(wide, "county_id", "county_name")
    assert {(r.county_id, r.county_name) for r in melted.collect()} == {
        ("0", "Alpha"),
        ("1", "Beta"),
        ("12", "Omega"),
    }


def test_write_append_overwrite_exists(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 0), (2, 1)], ["v", "part"])
    assert not writers.table_exists(spark, path)
    writers.write_append(df, path, partition_col="part")
    assert writers.table_exists(spark, path)
    writers.write_append(df, path, partition_col="part")
    assert readers.scan_table(spark, path).count() == 4  # append appends
    writers.write_overwrite(df, path, partition_col="part")
    assert readers.scan_table(spark, path).count() == 2  # overwrite resets
    assert not writers.write_if_absent(spark, df, path)  # no clobber


def test_schema_evolution_append(spark, tmp_path):
    """Appending a frame with a new column evolves the read schema
    (mergeSchema on the parquet path; transaction log under Delta)."""
    path = str(tmp_path / "evolve")
    writers.write_append(spark.createDataFrame([(1,)], ["a"]), path)
    writers.write_append(spark.createDataFrame([(2, "x")], ["a", "b"]), path)
    df = readers.scan_table(spark, path)
    assert set(df.columns) == {"a", "b"}
    rows = {(r.a, r.b) for r in df.collect()}
    assert rows == {(1, None), (2, "x")}


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 1000).withColumn("v", readers.F.col("id") * 2)
    df.repartition(20).write.parquet(path)
    assert len(spark.read.parquet(path).inputFiles()) == 20
    writers.compact(spark, path, target_files=2, sort_cols=["id"])
    out = readers.scan_table(spark, path)
    assert len(out.inputFiles()) == 2
    assert out.count() == 1000
    assert {r.id for r in out.collect()} == set(range(1000))


def test_compact_zorder_tightens_rowgroups(spark, tmp_path):
    """Compacting sorted by a Morton key clusters both dimensions: a
    selective filter on either column then skips most row groups. We
    assert the observable proxy — after z-order compaction into sorted
    files, each file covers a narrow range of the key."""
    from medallion_delta_lake_spark.functions.spatial import morton_key
    from pyspark.sql import functions as F

    path = str(tmp_path / "ztab")
    df = (
        spark.range(0, 4096)
        .select(
            (F.col("id") % 64).alias("a"),
            (F.col("id") / 64).cast("long").alias("b"),
        )
        .orderBy(F.rand(7))
    )
    df.withColumn("zkey", morton_key("a", "b", 6)).write.parquet(path)
    writers.compact(spark, path, target_files=8, sort_cols=["zkey"])

    out = readers.scan_table(spark, path)
    assert out.count() == 4096
    # per-file key ranges: with 8 sorted files the average span must be
    # far below the global span (clustering actually happened)
    spans = (
        out.groupBy(F.input_file_name().alias("f"))
        .agg((F.max("zkey") - F.min("zkey")).alias("span"))
        .collect()
    )
    global_span = 4095  # 12-bit morton space fully populated
    avg_span = sum(r.span for r in spans) / len(spans)
    assert len(spans) == 8
    assert avg_span < global_span / 4
