"""Upsert write-path semantics (SURVEY.md §2.9, §5.3): idempotency,
source-snapshot equivalence, delete-if-absent, update-if-changed —
plus hypothesis property tests for the pure merge-state function."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import upsert
from medallion_delta_lake_spark.sources import readers


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def _state(spark, path):
    return {
        (r.k, r.v) for r in readers.scan_table(spark, path).collect()
    }


def test_upsert_create_then_idempotent(spark, tmp_path):
    path = str(tmp_path / "t1")
    src = _mk(spark, [(1, "a"), (2, "b")])
    upsert.upsert(spark, src, path, keys=["k"])
    assert _state(spark, path) == {(1, "a"), (2, "b")}
    upsert.upsert(spark, src, path, keys=["k"])  # re-run: no change
    assert _state(spark, path) == {(1, "a"), (2, "b")}


def test_upsert_update_insert_delete(spark, tmp_path):
    path = str(tmp_path / "t2")
    upsert.upsert(spark, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), path, keys=["k"])
    # 1 updated, 2 unchanged, 3 absent (deleted), 4 inserted
    upsert.upsert(
        spark, _mk(spark, [(1, "A"), (2, "b"), (4, "d")]), path, keys=["k"]
    )
    assert _state(spark, path) == {(1, "A"), (2, "b"), (4, "d")}


def test_upsert_keep_missing(spark, tmp_path):
    path = str(tmp_path / "t3")
    upsert.upsert(spark, _mk(spark, [(1, "a"), (2, "b")]), path, keys=["k"])
    upsert.upsert(
        spark,
        _mk(spark, [(1, "A")]),
        path,
        keys=["k"],
        delete_missing=False,
    )
    assert _state(spark, path) == {(1, "A"), (2, "b")}


def test_upsert_table_is_latest_source_snapshot(spark, tmp_path):
    """With delete_missing the table must equal the deduped source —
    the materialized-view property (SURVEY.md §1 mutability model)."""
    path = str(tmp_path / "t4")
    for rows in [[(1, "a")], [(2, "x"), (3, "y")], [(3, "z")]]:
        src = _mk(spark, rows)
        upsert.upsert(spark, src, path, keys=["k"])
        assert _state(spark, path) == set(rows)


def test_upsert_multi_row_source_deterministic(spark, tmp_path):
    """Duplicate-key sources collapse to a deterministic winner before
    the merge (Delta MERGE would throw; dropDuplicates would be
    partition-order dependent)."""
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "q")]
    upsert.upsert(spark, _mk(spark, rows), pa, keys=["k"])
    upsert.upsert(spark, _mk(spark, list(reversed(rows))), pb, keys=["k"])
    assert _state(spark, pa) == _state(spark, pb)
    assert len(_state(spark, pa)) == 2


def test_upsert_null_safe_change_detection(spark, tmp_path):
    """NULL→value and value→NULL transitions must update (reference
    quirk Q3: `!=` is NULL-silent and would skip these)."""
    path = str(tmp_path / "t5")
    src1 = spark.createDataFrame([(1, None), (2, "b")], "k long, v string")
    upsert.upsert(spark, src1, path, keys=["k"])
    src2 = spark.createDataFrame([(1, "a"), (2, None)], "k long, v string")
    upsert.upsert(spark, src2, path, keys=["k"])
    assert _state(spark, path) == {(1, "a"), (2, None)}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=8),
    source=st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=8),
    delete_missing=st.booleans(),
)
def test_merge_state_properties(spark, target, source, delete_missing):
    """merge_state == dict-merge semantics for any key/value maps."""
    tdf = spark.createDataFrame(
        list(target.items()) or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    sdf = spark.createDataFrame(
        list(source.items()) or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    got = {
        (r.k, r.v)
        for r in upsert.merge_state(
            tdf, sdf, keys=["k"], delete_missing=delete_missing
        ).collect()
    }
    expected = dict(source) if delete_missing else {**target, **source}
    assert got == set(expected.items())


def test_delete_keys_removes_exactly_the_requested_rows(spark, tmp_path):
    from medallion_delta_lake_spark.operators import upsert as up

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k int, v string"
    )
    up.upsert(spark, df, path, keys=["k"])
    doomed = spark.createDataFrame([(k,) for k in (3, 50, 99, 1234)], "k int")
    removed = up.delete_keys(spark, path, doomed, keys=["k"])
    assert removed == 3  # 1234 never existed
    left = {r.k for r in spark.read.parquet(path).collect()}
    assert left == set(range(100)) - {3, 50, 99}
    # crash-safety dirs cleaned up
    import os as _os

    assert not _os.path.exists(path + "__staging")
    assert not _os.path.exists(path + "__old")
