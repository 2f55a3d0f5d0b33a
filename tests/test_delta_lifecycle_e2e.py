"""One continuous user journey across the whole log-backed Delta
engine — the workflow a reference user would actually run, feature
by feature in one table's lifetime: create → append (txn) → MERGE →
DELETE-by-DV → rename column → OPTIMIZE → checkpoint → change feed →
RESTORE → vacuum, with time travel asserted at every stage. Each
feature has focused tests elsewhere; this guards the INTERACTIONS
(e.g. CDF across a rename, optimize after DVs under a mapped schema,
restore across a checkpoint)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from medallion_delta_lake_spark.sources import delta_log as dl

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def test_full_lifecycle_one_table(spark, tmp_path):
    t = str(tmp_path / "life")

    # v0: create, partitioned
    base = (
        spark.range(100)
        .withColumn("grp", (F.col("id") % 4).cast("string"))
        .withColumn("v", F.col("id") * 10)
        .repartition(4)
    )
    v0 = dl.write_delta(spark, base, t, mode="overwrite", partition_by=["grp"])

    # v1: exactly-once append via SetTransaction
    extra = (
        spark.range(100, 110)
        .withColumn("grp", (F.col("id") % 4).cast("string"))
        .withColumn("v", F.col("id") * 10)
    )
    dl.write_delta(spark, extra, t, mode="append", txn=("ingest", 0))
    assert dl.last_txn_version(t, "ingest") == 0
    assert dl.read_delta(spark, t).count() == 110

    # v2: incremental MERGE (file-scoped) — update 2, insert 1
    src = spark.createDataFrame(
        [(5, "1", 555), (6, "2", 666), (200, "0", 2)],
        "id long, grp string, v long",
    )
    dl.upsert_delta_log(spark, src, t, keys=["id"], delete_missing=False)
    got = {r.id: r.v for r in dl.read_delta(spark, t).collect()}
    assert got[5] == 555 and got[6] == 666 and got[200] == 2
    assert len(got) == 111

    # v3: row-level DELETE via deletion vectors
    del_res = dl.delete_delta_log(spark, t, [("id", "<", 20)])
    assert del_res["deleted_rows"] == 20
    assert dl.read_delta(spark, t).count() == 91

    # v4: metadata-only rename (auto-enables column mapping → v4+v5)
    dl.rename_column(t, "v", "value")
    df = dl.read_delta(spark, t)
    assert set(df.columns) == {"id", "grp", "value"}
    assert df.count() == 91

    # OPTIMIZE materializes the DVs under the mapped schema
    opt = dl.optimize_delta_log(spark, t, target_file_bytes=1 << 20)
    snap = dl.resolve_snapshot(t)
    assert not any(a.get("deletionVector") for a in snap["files"].values())
    assert dl.read_delta(spark, t).count() == 91

    # checkpoint; replay must reproduce the same state from parquet
    dl.write_checkpoint(t, parts=2)
    assert dl.read_delta(spark, t).count() == 91
    assert dl.last_txn_version(t, "ingest") == 0  # txn survives ckpt

    # change feed: the DELETE commit shows exactly the 20 rows
    cdf = dl.table_changes(spark, t, del_res["version"], del_res["version"])
    rows = cdf.collect()
    assert {r.id for r in rows} == set(range(20))
    assert all(r._change_type == "delete" for r in rows)
    # CDF decodes that commit against its own (pre-rename) metaData
    assert "v" in cdf.columns and "value" not in cdf.columns

    # post-rename append interoperates with every earlier file
    extra2 = spark.createDataFrame(
        [(300, "0", 3000)], "id long, grp string, value long"
    )
    dl.write_delta(spark, extra2, t, mode="append")
    assert dl.read_delta(spark, t).count() == 92

    # RESTORE to the pre-delete state (keeps history)
    res = dl.restore_delta_log(t, del_res["version"] - 1)
    restored = dl.read_delta(spark, t)
    # pre-delete snapshot: 111 rows, pre-rename schema reinstated
    assert restored.count() == 111
    assert set(restored.columns) == {"id", "grp", "v"}
    # the restore is itself one more time-travelable version
    assert dl.read_delta(spark, t, version_as_of=res["version"] - 1).count() == 92

    # history names every operation, newest first
    ops = [h["operation"] for h in dl.table_history(t)]
    assert ops[0] == "RESTORE"
    assert "DELETE" in ops and "MERGE" in ops and "OPTIMIZE" in ops
    assert "RENAME COLUMN" in ops and "SET COLUMN MAPPING" in ops

    # vacuum to the latest snapshot only; current reads stay intact
    dl.vacuum(t, keep_versions=1, staging_ttl_s=0)
    assert dl.read_delta(spark, t).count() == 111
    assert dl.resolve_snapshot(t)["version"] == res["version"]
    # and v0 data files that the restore resurrected are still there
    assert sorted(r.id for r in dl.read_delta(spark, t).collect())[:3] == [0, 1, 2]
