"""Log-compaction files (PROTOCOL.md "Log Compaction"): a
``{start}.{end}.compacted.json`` carrying the reconciled actions of a
commit range; resolve_snapshot substitutes it for the per-commit JSON
reads during replay."""

from __future__ import annotations

import os

from medallion_delta_lake_spark.sources import delta_log as dl

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def _mk(spark, tmp_path):
    p = str(tmp_path / "t")
    dl.write_delta(
        spark,
        spark.createDataFrame([(1, "a")], "id long, v string").coalesce(1),
        p,
    )
    for i in range(2, 6):
        dl.write_delta(
            spark,
            spark.createDataFrame(
                [(i, f"v{i}")], "id long, v string"
            ).coalesce(1),
            p,
            mode="append",
        )
    dl.delete_delta_log(spark, p, [("id", "=", 3)])  # version 5
    return p


def _snap_sig(snap):
    return (
        snap["version"],
        sorted(snap["files"]),
        snap["meta"]["schemaString"],
    )


def test_compaction_equivalence_and_fast_path(spark, tmp_path):
    p = _mk(spark, tmp_path)
    before = _snap_sig(dl.resolve_snapshot(p))
    rows_before = {
        (r.id, r.v) for r in dl.read_delta(spark, p).collect()
    }
    dest = dl.write_log_compaction(p, 1, 4)
    assert os.path.basename(dest).endswith(".compacted.json")
    # same snapshot with the compaction present
    assert _snap_sig(dl.resolve_snapshot(p)) == before
    # the compacted range's JSONs can disappear and replay still works
    # through the compaction file (commits 0 and 5 remain)
    log = os.path.join(p, "_delta_log")
    for v in range(1, 5):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    assert _snap_sig(dl.resolve_snapshot(p)) == before
    assert {
        (r.id, r.v) for r in dl.read_delta(spark, p).collect()
    } == rows_before
    # time travel to the compaction END resolves; mid-range does not
    assert dl.resolve_snapshot(p, version_as_of=4)["version"] == 4
    # version listing is unpolluted by the compaction file name
    assert dl._list_versions(log) == [0, 5]


def test_compaction_reconciles_add_then_remove(spark, tmp_path):
    """A file added and later DV-rewritten inside the window must not
    resurrect: the reconciled file carries the final disposition."""
    p = _mk(spark, tmp_path)
    # window covers the delete too (its remove+re-add pair)
    dl.write_log_compaction(p, 0, 5)
    snap_direct = dl.resolve_snapshot(p)
    got = {(r.id, r.v) for r in dl.read_delta(spark, p).collect()}
    assert (3, "v3") not in got and len(got) == 4
    # replay purely through the compaction
    log = os.path.join(p, "_delta_log")
    for v in range(0, 6):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    # keep ONE empty later commit so the table still has a version
    dl.write_delta(
        spark,
        spark.createDataFrame([(9, "z")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    snap = dl.resolve_snapshot(p)
    assert set(snap_direct["files"]) <= set(snap["files"])
    got2 = {(r.id, r.v) for r in dl.read_delta(spark, p).collect()}
    assert got2 == got | {(9, "z")}


def test_compaction_refuses_holes(spark, tmp_path):
    p = _mk(spark, tmp_path)
    log = os.path.join(p, "_delta_log")
    os.unlink(os.path.join(log, f"{2:020d}.json"))
    import pytest

    with pytest.raises(FileNotFoundError, match="holes"):
        dl.write_log_compaction(p, 0, 5)


def test_compaction_preserves_domains_and_row_tracking(spark, tmp_path):
    p = _mk(spark, tmp_path)
    dl.enable_row_tracking(p)  # version 6
    dl.write_delta(
        spark,
        spark.createDataFrame([(7, "q")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )  # version 7
    dl.write_log_compaction(p, 0, 7)
    before = {
        r.id: r._row_id
        for r in dl.read_delta_row_ids(spark, p).collect()
    }
    log = os.path.join(p, "_delta_log")
    for v in range(0, 8):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    dl.write_delta(
        spark,
        spark.createDataFrame([(8, "r")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    after = {
        r.id: r._row_id
        for r in dl.read_delta_row_ids(spark, p).collect()
    }
    for k, v in before.items():
        assert after[k] == v
    assert after[8] == max(before.values()) + 1  # hwm survived


def test_maybe_compact_log_policy(spark, tmp_path):
    p = str(tmp_path / "t2")
    dl.write_delta(
        spark,
        spark.createDataFrame([(0, "x")], "id long, v string").coalesce(1),
        p,
    )
    for i in range(1, 4):
        dl.write_delta(
            spark,
            spark.createDataFrame(
                [(i, "x")], "id long, v string"
            ).coalesce(1),
            p,
            mode="append",
        )
    assert dl.maybe_compact_log(p, interval=5) is None  # 4 commits
    dl.write_delta(
        spark,
        spark.createDataFrame([(4, "x")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    assert dl.maybe_compact_log(p, interval=5) == (0, 4)
    # nothing new due right after
    assert dl.maybe_compact_log(p, interval=5) is None
    # five more commits -> the next window compacts from 5
    for i in range(5, 10):
        dl.write_delta(
            spark,
            spark.createDataFrame(
                [(i, "x")], "id long, v string"
            ).coalesce(1),
            p,
            mode="append",
        )
    assert dl.maybe_compact_log(p, interval=5) == (5, 9)
    assert dl.read_delta(spark, p).count() == 10
