"""ALTER TABLE ADD/DROP COLUMN for the log-backed Delta engine.

Both are metadata-only commits: ADD null-fills old files on read,
DROP hides the bytes behind column mapping. The resurrection trap —
drop a column, re-add the same name, old bytes reappear — is what
the fresh-physical-name rule prevents; it is pinned here.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.sources import delta_log


def _t(spark, tmp_path, rows=((1, "a"), (2, "b"))):
    t = str(tmp_path / "t")
    delta_log.write_delta(
        spark,
        spark.createDataFrame(list(rows), "id int, v string").coalesce(1),
        t,
    )
    return t


def test_add_column_null_fills_old_files(spark, tmp_path):
    t = _t(spark, tmp_path)
    delta_log.add_column(t, "score", "double")
    out = delta_log.read_delta(spark, t)
    assert out.columns == ["id", "v", "score"]
    assert {(r.id, r.v, r.score) for r in out.collect()} == {
        (1, "a", None),
        (2, "b", None),
    }
    # appends now carry the evolved schema
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(3, "c", 0.5)], "id int, v string, score double"
        ).coalesce(1),
        t,
        mode="append",
    )
    got = {(r.id, r.score) for r in delta_log.read_delta(spark, t).collect()}
    assert (3, 0.5) in got and (1, None) in got


def test_add_column_rejects_duplicate(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        delta_log.add_column(t, "v", "string")


def test_drop_column_hides_data(spark, tmp_path):
    t = _t(spark, tmp_path)
    delta_log.drop_column(t, "v")
    out = delta_log.read_delta(spark, t)
    assert out.columns == ["id"]
    assert {r.id for r in out.collect()} == {1, 2}
    # time travel still sees the column at the old version
    old = delta_log.read_delta(spark, t, version_as_of=0)
    assert "v" in old.columns


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    """The classic trap: drop v, add v back — old bytes must NOT
    reappear (fresh physical name under mapping keys the new field to
    nothing in the old files)."""
    t = _t(spark, tmp_path)
    delta_log.drop_column(t, "v")
    delta_log.add_column(t, "v", "string")
    got = {(r.id, r.v) for r in delta_log.read_delta(spark, t).collect()}
    assert got == {(1, None), (2, None)}


def test_drop_column_guards(spark, tmp_path):
    t = str(tmp_path / "p")
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(1, "x", 2)], "id int, part string, v int"),
        t,
        partition_by=["part"],
    )
    with pytest.raises(ValueError, match="partition column"):
        delta_log.drop_column(t, "part")

    t2 = _t(spark, tmp_path)
    delta_log.add_check_constraint(spark, t2, "v_nonempty", "length(v) > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        delta_log.drop_column(t2, "v")
    delta_log.drop_check_constraint(t2, "v_nonempty")
    delta_log.drop_column(t2, "v")  # now allowed
    with pytest.raises(ValueError, match="only column"):
        delta_log.drop_column(t2, "id")


def test_dropped_column_invisible_to_merge(spark, tmp_path):
    """Post-drop MERGE operates on the narrowed schema end-to-end."""
    t = _t(spark, tmp_path)
    delta_log.drop_column(t, "v")
    delta_log.upsert_delta_log(
        spark,
        spark.createDataFrame([(2,), (3,)], "id int").coalesce(1),
        t,
        keys=["id"],
        delete_missing=True,
    )
    assert {r.id for r in delta_log.read_delta(spark, t).collect()} == {2, 3}


def test_optimize_purges_dropped_column_bytes(spark, tmp_path):
    """REORG-style physical purge: OPTIMIZE rewrites live files
    through the CURRENT logical schema, so a dropped column's bytes
    leave the parquet footprint (and a later re-add still reads NULL
    for rewritten files — physically, not just via mapping)."""
    import glob

    import pyarrow.parquet as pq

    import os

    t = _t(spark, tmp_path)
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(3, "c")], "id int, v string").coalesce(1),
        t,
        mode="append",
    )
    delta_log.drop_column(t, "v")
    out = delta_log.optimize_delta_log(spark, t, small_file_bytes=1 << 30)
    assert out["files_compacted"] == 2
    snap = delta_log.resolve_snapshot(t)
    for rel in snap["files"]:
        cols = pq.ParquetFile(os.path.join(t, rel)).schema_arrow.names
        assert all("v" not in c for c in cols), cols
    assert {r.id for r in delta_log.read_delta(spark, t).collect()} == {
        1,
        2,
        3,
    }
