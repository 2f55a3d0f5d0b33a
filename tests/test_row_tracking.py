"""Delta row tracking (PROTOCOL.md "Row Tracking"): fresh row ids via
``baseRowId`` + position, the ``delta.rowTracking`` domain-metadata
high-water mark, id stability through DELETE-by-DV and OPTIMIZE
(materialized columns), and checkpoint round-trip of domain metadata."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from medallion_delta_lake_spark.sources import delta_log as dl


def _mk(spark, tmp_path, n=6, files=2):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], "id long, v string"
    ).repartition(files)
    dl.write_delta(spark, df, p)
    return p


def _ids(spark, p):
    return {
        r.id: (r._row_id, r._row_commit_version)
        for r in dl.read_delta_row_ids(spark, p).collect()
    }


def test_enablement_shape_and_backfill(spark, tmp_path):
    p = _mk(spark, tmp_path)
    v = dl.enable_row_tracking(p)
    snap = dl.resolve_snapshot(p)
    proto = snap["protocol"]
    assert proto["minWriterVersion"] == 7
    assert {"rowTracking", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    conf = snap["meta"]["configuration"]
    assert conf["delta.enableRowTracking"] == "true"
    assert "delta.rowTracking.materializedRowIdColumnName" in conf
    # backfill: every pre-enablement file now carries a baseRowId
    adds = list(snap["files"].values())
    assert all("baseRowId" in a for a in adds)
    assert all(a["defaultRowCommitVersion"] == v for a in adds)
    # high-water mark covers all rows
    hwm = json.loads(snap["domains"]["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ]
    assert hwm == 5  # 6 rows, ids 0..5
    # ids are unique, cover 0..5, all readable
    ids = _ids(spark, p)
    assert sorted(rid for rid, _ in ids.values()) == list(range(6))
    assert all(rcv == v for _, rcv in ids.values())
    # idempotent
    assert dl.enable_row_tracking(p) == v


def test_append_assigns_fresh_monotone_ids(spark, tmp_path):
    p = _mk(spark, tmp_path, n=4, files=1)
    dl.enable_row_tracking(p)
    before = _ids(spark, p)
    dl.write_delta(
        spark,
        spark.createDataFrame(
            [(10, "x"), (11, "y")], "id long, v string"
        ).coalesce(1),
        p,
        mode="append",
    )
    after = _ids(spark, p)
    # old rows keep their ids
    for k, v in before.items():
        assert after[k] == v
    # new rows get fresh ids above the old high-water mark
    new_ids = sorted(after[k][0] for k in (10, 11))
    assert new_ids == [4, 5]
    snap = dl.resolve_snapshot(p)
    assert (
        json.loads(snap["domains"]["delta.rowTracking"])[
            "rowIdHighWaterMark"
        ]
        == 5
    )


def test_delete_by_dv_preserves_surviving_ids(spark, tmp_path):
    p = _mk(spark, tmp_path, n=6, files=1)
    dl.enable_row_tracking(p)
    before = _ids(spark, p)
    dl.delete_delta_log(spark, p, [("id", "=", 2)])
    after = _ids(spark, p)
    assert 2 not in after
    for k in after:
        assert after[k] == before[k]
    # the re-added file kept its baseRowId (no hwm advance)
    snap = dl.resolve_snapshot(p)
    hwm = json.loads(snap["domains"]["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ]
    assert hwm == 5


def test_optimize_materializes_and_preserves_ids(spark, tmp_path):
    p = _mk(spark, tmp_path, n=8, files=4)
    dl.enable_row_tracking(p)
    before = _ids(spark, p)
    out = dl.optimize_delta_log(spark, p)
    assert out["files_compacted"] >= 2
    after = _ids(spark, p)
    assert after == before  # ids and commit versions survive compaction
    # the rewritten files carry the materialized physical columns
    snap = dl.resolve_snapshot(p)
    conf = snap["meta"]["configuration"]
    idc = conf["delta.rowTracking.materializedRowIdColumnName"]
    new_rels = [
        rel
        for rel, add in snap["files"].items()
        if add.get("dataChange") is False
    ]
    assert new_rels
    for rel in new_rels:
        cols = set(
            pq.ParquetFile(os.path.join(p, rel)).schema_arrow.names
        )
        assert idc in cols
    # regular reads are untouched by the extra physical columns
    got = {
        (r.id, r.v) for r in dl.read_delta(spark, p).collect()
    }
    assert got == {(i, f"v{i}") for i in range(8)}
    # a fresh append after OPTIMIZE continues above the watermark
    dl.write_delta(
        spark,
        spark.createDataFrame([(99, "z")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    final = _ids(spark, p)
    assert final[99][0] > max(rid for rid, _ in before.values())


def test_checkpoint_roundtrips_domain_metadata(spark, tmp_path):
    p = _mk(spark, tmp_path, n=3, files=1)
    dl.enable_row_tracking(p)
    v = dl.write_checkpoint(p)
    # delete the JSON commits the checkpoint covers: replay must come
    # from the checkpoint alone, including the rowTracking domain
    log = os.path.join(p, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and int(f[:20]) <= v:
            os.unlink(os.path.join(log, f))
    snap = dl.resolve_snapshot(p)
    assert "delta.rowTracking" in snap["domains"]
    hwm = json.loads(snap["domains"]["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ]
    assert hwm == 2
    # and the next append continues from it
    dl.write_delta(
        spark,
        spark.createDataFrame([(7, "q")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    ids = _ids(spark, p)
    assert ids[7][0] == 3


def test_read_row_ids_requires_enablement(spark, tmp_path):
    p = _mk(spark, tmp_path, n=2, files=1)
    with pytest.raises(dl.DeltaProtocolError):
        dl.read_delta_row_ids(spark, p)


def test_untracked_tables_unaffected(spark, tmp_path):
    """No row-tracking bookkeeping leaks into plain tables."""
    p = _mk(spark, tmp_path, n=3, files=1)
    dl.write_delta(
        spark,
        spark.createDataFrame([(9, "w")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    snap = dl.resolve_snapshot(p)
    assert snap["domains"] == {}
    assert all("baseRowId" not in a for a in snap["files"].values())


def test_concurrent_appends_assign_unique_ids(spark, tmp_path):
    """Two appends racing for the same version: the loser's retry must
    RE-assign its baseRowIds against the winner's advanced high-water
    mark (preservation is judged by snapshot, not the staged dict)."""
    from concurrent.futures import ThreadPoolExecutor

    p = _mk(spark, tmp_path, n=2, files=1)
    dl.enable_row_tracking(p)

    def append(k):
        dl.write_delta(
            spark,
            spark.createDataFrame(
                [(100 + 2 * k, "a"), (101 + 2 * k, "b")],
                "id long, v string",
            ).coalesce(1),
            p,
            mode="append",
        )

    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(append, range(3)))
    ids = _ids(spark, p)
    rids = sorted(rid for rid, _ in ids.values())
    assert rids == list(range(8))  # 2 base + 6 appended, no collisions
    snap = dl.resolve_snapshot(p)
    assert (
        json.loads(snap["domains"]["delta.rowTracking"])[
            "rowIdHighWaterMark"
        ]
        == 7
    )
