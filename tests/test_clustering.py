"""Clustered tables (delta.clustering domain + clustering writer
feature): CLUSTER BY declaration, OPTIMIZE auto-pickup, skipping
payoff, and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_delta_lake_spark.sources import delta_log


def _table(spark, tmp_path, n=16384):
    t = str(tmp_path / "ctab")
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") * 2654435761 % n).cast("bigint"))
        .withColumn("y", (F.col("id") * 40503 % n).cast("bigint"))
        .repartition(8)
    )
    delta_log.write_delta(spark, df, t, mode="overwrite")
    return t, df, n


def test_cluster_by_declares_and_optimize_picks_up(spark, tmp_path):
    t, df, n = _table(spark, tmp_path)
    v = delta_log.set_clustering_columns(spark, t, ["x", "y"])
    snap = delta_log.resolve_snapshot(t)
    assert snap["version"] == v
    assert delta_log.clustering_columns(snap) == ["x", "y"]
    proto = snap["protocol"]
    assert proto["minWriterVersion"] == 7
    assert {"clustering", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    # plain OPTIMIZE (no zorder_by) re-clusters by the declared cols
    res = delta_log.optimize_delta_log(
        spark, t, target_file_bytes=16 << 10
    )
    assert res["files_written"] >= 8
    snap = delta_log.resolve_snapshot(t)
    for col in ("x", "y"):
        flt = [(col, "<", n // 8)]
        survivors = [
            rel
            for rel, add in snap["files"].items()
            if not delta_log._file_can_skip(add, flt, [])
        ]
        assert len(survivors) <= 0.6 * len(snap["files"]), (
            col,
            len(survivors),
            len(snap["files"]),
        )
    # correctness untouched
    got = delta_log.read_delta(
        spark, t, filters=[("x", "<", 100)]
    ).count()
    assert got == df.filter(F.col("x") < 100).count()


def test_explicit_zorder_overrides_clustering(spark, tmp_path):
    t, _, _ = _table(spark, tmp_path, n=2048)
    delta_log.set_clustering_columns(spark, t, ["x", "y"])
    res = delta_log.optimize_delta_log(
        spark, t, zorder_by=["y"], target_file_bytes=16 << 10
    )
    assert res["files_written"] >= 1


def test_cluster_by_guards(spark, tmp_path):
    t, _, _ = _table(spark, tmp_path, n=512)
    with pytest.raises(KeyError):
        delta_log.set_clustering_columns(spark, t, ["nope"])
    with pytest.raises(ValueError, match="one or two"):
        delta_log.set_clustering_columns(
            spark, t, ["id", "x", "y"]
        )
    # partition-column rejection
    tp = str(tmp_path / "ptab")
    delta_log.write_delta(
        spark,
        spark.range(64).withColumn("p", F.col("id") % 4),
        tp,
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition"):
        delta_log.set_clustering_columns(spark, tp, ["p"])


def test_redeclare_replaces_columns(spark, tmp_path):
    t, _, _ = _table(spark, tmp_path, n=512)
    delta_log.set_clustering_columns(spark, t, ["x", "y"])
    delta_log.set_clustering_columns(spark, t, ["x"])
    assert delta_log.clustering_columns(
        delta_log.resolve_snapshot(t)
    ) == ["x"]
