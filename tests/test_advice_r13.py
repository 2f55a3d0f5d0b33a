"""ADVICE r12 fixes, pinned:

1. (medium) streaming CDF reads of cdc ``_change_data`` files fall
   back to LOGICAL column names when the physical name is absent
   (pre-r9 files that staged logical names under name-mode column
   mapping) — batch and stream CDF must agree on the same table
   instead of the stream silently emitting NULLs.
2. (low) the CDF surface carries ``_commit_timestamp`` (Delta's
   readChangeFeed contract) in BOTH batch ``table_changes`` and the
   streaming source, resolved the same way per commit.
3. (low) a CDF stream WITHOUT ``startingVersion`` emits the current
   snapshot as ``insert`` rows first (Delta's streaming default),
   not an empty initial batch — and a checkpointed resume neither
   re-emits nor skips it.
4. (low) ``partitions()`` replays the log ONCE per microbatch and
   folds commits incrementally (covered implicitly: the multi-commit
   feeds here cross OPTIMIZE/metaData commits and stay correct).
5. (low) ``kmv_diff_ops`` on two EMPTY sketches returns defined
   zeros, not NULLs from a 0/0 division.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import sketches as sk
from medallion_delta_lake_spark.sources import delta_log as dl
from medallion_delta_lake_spark.sources import python_datasource as pds

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def _feed_all(spark, path: str, name: str, starting: int | None = None):
    r = (
        spark.readStream.format(pds.FORMAT_NAME)
        .option("path", path)
        .option("readChangeFeed", "true")
    )
    if starting is not None:
        r = r.option("startingVersion", str(starting))
    q = (
        r.load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_cdf_default_emits_initial_snapshot(spark, tmp_path):
    pds.register(spark)
    p = str(tmp_path / "t")
    dl.write_delta(
        spark,
        spark.range(7).select("id", (F.col("id") * 10).alias("v"))
        .coalesce(1),
        p,
        mode="overwrite",
    )
    dl.delete_delta_log(spark, p, [("id", "=", 6)])
    out = _feed_all(spark, p, "cdf_" + uuid.uuid4().hex[:8])
    rows = out.collect()
    # current snapshot (6 live rows) as inserts stamped with the
    # snapshot version — NOT an empty first batch
    assert len(rows) == 6
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert {r["_commit_version"] for r in rows} == {1}
    assert {r["id"] for r in rows} == set(range(6))
    assert all(r["_commit_timestamp"] is not None for r in rows)


def test_stream_cdf_snapshot_then_changes_with_resume(spark, tmp_path):
    pds.register(spark)
    p = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    dl.write_delta(
        spark,
        spark.range(5).select("id", (F.col("id") * 10).alias("v"))
        .coalesce(1),
        p,
        mode="overwrite",
    )

    def run():
        q = (
            spark.readStream.format(pds.FORMAT_NAME)
            .option("path", p)
            .option("readChangeFeed", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert spark.read.parquet(sink).count() == 5  # the snapshot
    dl.write_delta(
        spark,
        spark.range(5, 8).select("id", (F.col("id") * 10).alias("v"))
        .coalesce(1),
        p,
        mode="append",
    )
    run()
    out = spark.read.parquet(sink)
    # resume tails ONLY the new commit — the snapshot is neither
    # re-emitted (offset carries snapshot_done) nor skipped
    assert out.count() == 8
    got = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in out.groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {(0, "insert"): 5, (1, "insert"): 3}


def test_commit_timestamp_batch_stream_agree(spark, tmp_path):
    pds.register(spark)
    p = str(tmp_path / "t")
    dl.write_delta(
        spark,
        spark.range(4).select("id", (F.col("id") * 10).alias("v"))
        .coalesce(1),
        p,
        mode="overwrite",
    )
    dl.write_delta(
        spark,
        spark.range(4, 6).select("id", (F.col("id") * 10).alias("v"))
        .coalesce(1),
        p,
        mode="append",
    )
    dl.delete_delta_log(spark, p, [("id", "=", 0)])

    def ts_by_version(df):
        return {
            r["_commit_version"]: r["ts"]
            for r in df.groupBy("_commit_version")
            .agg(F.max("_commit_timestamp").alias("ts"))
            .collect()
        }

    batch = dl.table_changes(spark, p, 0)
    assert "_commit_timestamp" in batch.columns
    b = ts_by_version(batch)
    s = ts_by_version(
        _feed_all(spark, p, "cdf_" + uuid.uuid4().hex[:8], starting=0)
    )
    assert set(b) == set(s) == {0, 1, 2}
    assert all(v is not None for v in b.values())
    assert b == s  # same per-commit resolution in both faces


def test_stream_cdc_logical_name_fallback(spark, tmp_path):
    """A cdc file staging LOGICAL column names on a name-mode mapped
    table (the pre-r9 on-disk shape) must stream back with real
    values — mirroring batch table_changes' fallback — not NULLs."""
    import pyarrow.parquet as pq

    pds.register(spark)
    p = str(tmp_path / "t")
    dl.write_delta(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
        .coalesce(1),
        p,
        mode="overwrite",
    )
    dl.set_table_properties(p, {"delta.enableChangeDataFeed": "true"})
    dl.enable_column_mapping(p)
    dl.rename_column(p, "v", "amount")
    out = dl.update_delta_log(
        spark, p, [("k", "=", 1)], {"amount": "amount + 5"}
    )
    # rewrite the commit's cdc files with LOGICAL names, simulating a
    # pre-r9 producer (physical → logical rename inside the parquet)
    snap = dl.resolve_snapshot(p)
    fields = dl.json.loads(snap["meta"]["schemaString"])["fields"]
    phys_to_logical = {
        f["metadata"]["delta.columnMapping.physicalName"]: f["name"]
        for f in fields
    }
    cdir = os.path.join(p, "_change_data")
    for name in os.listdir(cdir):
        fp = os.path.join(cdir, name)
        t = pq.read_table(fp)
        t = t.rename_columns(
            [phys_to_logical.get(c, c) for c in t.column_names]
        )
        pq.write_table(t, fp)

    feed = _feed_all(
        spark, p, "cdf_" + uuid.uuid4().hex[:8],
        starting=out["version"],
    )
    rows = sorted(
        (r["k"], r["amount"], r["_change_type"]) for r in feed.collect()
    )
    assert rows == [
        (1, 10, "update_preimage"),
        (1, 15, "update_postimage"),
    ]
    # batch agrees on the identical files
    brows = sorted(
        (r["k"], r["amount"], r["_change_type"])
        for r in dl.table_changes(
            spark, p, out["version"], out["version"]
        ).collect()
    )
    assert brows == rows


def test_kmv_diff_ops_empty_sketches(spark):
    empty = spark.createDataFrame([], "h bigint")
    row = sk.kmv_diff_ops(empty, empty, k=16).collect()[0]
    assert row["x_n"] == 0
    assert row["d_ab"] == 0 and row["d_ba"] == 0
    assert row["union_est_q6"] == 0
    assert row["diff_ab_est_q6"] == 0 and row["diff_ba_est_q6"] == 0


def test_stream_cdf_initial_snapshot_under_column_mapping(spark, tmp_path):
    """The no-startingVersion snapshot emission must resolve
    physical→logical names on a column-mapped table: after a RENAME,
    the snapshot partitions carry the mapping and the stream serves
    the NEW logical name with real values (not NULLs)."""
    pds.register(spark)
    p = str(tmp_path / "t")
    dl.write_delta(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
        .coalesce(1),
        p,
        mode="overwrite",
    )
    dl.enable_column_mapping(p)
    dl.rename_column(p, "v", "amount")
    out = _feed_all(spark, p, "cdf_" + uuid.uuid4().hex[:8])
    rows = sorted((r["k"], r["amount"], r["_change_type"]) for r in out.collect())
    assert rows == [(1, 10, "insert"), (2, 20, "insert")]
