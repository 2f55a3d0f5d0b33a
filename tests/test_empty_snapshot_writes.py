"""Empty-snapshot / empty-source edges of every Delta write op.

Round-7 verdict: ``_scan_adds``'s zero-live-file branch dropped the
``keep_positions`` contract, so ANY ``delete_missing=True`` merge into
a table whose snapshot had zero live files (e.g. after a full-source
sync against an empty feed) raised ``UNRESOLVED_COLUMN
__dv_file_base`` — permanently bricking the table's sync-merge path.

This module pins the whole write family against BOTH edges:

* **empty table** — a snapshot with zero live files (created by the
  exact production sequence: create with rows, then full-sync an
  empty source);
* **empty source** — merging/upserting a 0-row DataFrame into a
  populated table.

Ops covered: upsert (both delete_missing modes), general MERGE,
DELETE, UPDATE, OPTIMIZE, append write.
"""

from __future__ import annotations

from medallion_delta_lake_spark.sources import delta_log

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def _empty_src(spark):
    return spark.createDataFrame([], "k int, v int")


def _src(spark, rows):
    return spark.createDataFrame(rows, "k int, v int")


def _rows(spark, path, **kw):
    return {
        (r.k, r.v) for r in delta_log.read_delta(spark, path, **kw).collect()
    }


def _zero_file_table(spark, path: str) -> None:
    """Create a table then full-sync an empty source: 0 live files."""
    delta_log.upsert_delta_log(
        spark, _src(spark, [(1, 10), (2, 20)]), path, keys=["k"]
    )
    delta_log.upsert_delta_log(
        spark, _empty_src(spark), path, keys=["k"], delete_missing=True
    )
    assert delta_log.resolve_snapshot(path)["files"] == {}
    assert _rows(spark, path) == set()


# ---------------------------------------------------------------- #
# the r7 crash: zero-file table, then further writes                #
# ---------------------------------------------------------------- #


def test_sync_merge_after_empty_sync(spark, tmp_path):
    """The exact r7 repro: create → empty full-sync → delete_missing
    merge. Must insert, not raise UNRESOLVED_COLUMN."""
    t = str(tmp_path / "t")
    _zero_file_table(spark, t)
    delta_log.upsert_delta_log(
        spark, _src(spark, [(3, 30)]), t, keys=["k"], delete_missing=True
    )
    assert _rows(spark, t) == {(3, 30)}
    # and the table keeps working afterwards
    delta_log.upsert_delta_log(
        spark, _src(spark, [(3, 31), (4, 40)]), t, keys=["k"]
    )
    assert _rows(spark, t) == {(3, 31), (4, 40)}


def test_plain_upsert_into_zero_file_table(spark, tmp_path):
    t = str(tmp_path / "t")
    _zero_file_table(spark, t)
    delta_log.upsert_delta_log(spark, _src(spark, [(5, 50)]), t, keys=["k"])
    assert _rows(spark, t) == {(5, 50)}


def test_general_merge_into_zero_file_table(spark, tmp_path):
    t = str(tmp_path / "t")
    _zero_file_table(spark, t)
    delta_log.merge_delta_log(
        spark,
        _src(spark, [(7, 70)]),
        t,
        keys=["k"],
        clauses=[
            {"when": "matched", "action": "update", "set": {"v": "s.v"}},
            {"when": "not_matched", "action": "insert"},
        ],
    )
    assert _rows(spark, t) == {(7, 70)}


def test_delete_update_optimize_on_zero_file_table(spark, tmp_path):
    t = str(tmp_path / "t")
    _zero_file_table(spark, t)
    d = delta_log.delete_delta_log(spark, t, [("k", "=", 1)])
    assert d["deleted_rows"] == 0
    u = delta_log.update_delta_log(
        spark, t, [("k", "=", 1)], {"v": "v + 1"}
    )
    assert u["updated_rows"] == 0
    o = delta_log.optimize_delta_log(spark, t)
    assert o["files_written"] == 0
    assert _rows(spark, t) == set()


def test_append_to_zero_file_table(spark, tmp_path):
    t = str(tmp_path / "t")
    _zero_file_table(spark, t)
    delta_log.write_delta(spark, _src(spark, [(9, 90)]), t, mode="append")
    assert _rows(spark, t) == {(9, 90)}


def test_zero_file_partitioned_table_sync_merge(spark, tmp_path):
    """Same edge on a hive-partitioned table (separate rewrite path)."""
    t = str(tmp_path / "t")
    delta_log.upsert_delta_log(
        spark,
        _src(spark, [(1, 10), (2, 20)]),
        t,
        keys=["k"],
        partition_by=["v"],
    )
    delta_log.upsert_delta_log(
        spark, _empty_src(spark), t, keys=["k"], delete_missing=True
    )
    assert delta_log.resolve_snapshot(t)["files"] == {}
    delta_log.upsert_delta_log(
        spark, _src(spark, [(3, 30)]), t, keys=["k"], delete_missing=True
    )
    assert _rows(spark, t) == {(3, 30)}


# ---------------------------------------------------------------- #
# empty SOURCE against a populated table                            #
# ---------------------------------------------------------------- #


def test_empty_source_incremental_upsert_is_noop(spark, tmp_path):
    """delete_missing=False (incremental): an empty batch is a no-op.
    (The DEFAULT delete_missing=True is a full-source sync, where an
    empty source correctly truncates — covered by _zero_file_table.)"""
    t = str(tmp_path / "t")
    delta_log.upsert_delta_log(
        spark, _src(spark, [(1, 10)]), t, keys=["k"]
    )
    delta_log.upsert_delta_log(
        spark, _empty_src(spark), t, keys=["k"], delete_missing=False
    )
    assert _rows(spark, t) == {(1, 10)}


def test_empty_source_general_merge(spark, tmp_path):
    """not_matched_by_source delete with an empty source = truncate."""
    t = str(tmp_path / "t")
    delta_log.upsert_delta_log(
        spark, _src(spark, [(1, 10), (2, 20)]), t, keys=["k"]
    )
    delta_log.merge_delta_log(
        spark,
        _empty_src(spark),
        t,
        keys=["k"],
        clauses=[
            {"when": "not_matched_by_source", "action": "delete"},
        ],
    )
    assert _rows(spark, t) == set()
    # and a keep-everything merge with an empty source is a no-op
    t2 = str(tmp_path / "t2")
    delta_log.upsert_delta_log(
        spark, _src(spark, [(1, 10)]), t2, keys=["k"]
    )
    delta_log.merge_delta_log(
        spark,
        _empty_src(spark),
        t2,
        keys=["k"],
        clauses=[
            {"when": "matched", "action": "update", "set": {"v": "s.v"}},
            {"when": "not_matched", "action": "insert"},
        ],
    )
    assert _rows(spark, t2) == {(1, 10)}


def test_empty_source_on_zero_file_table(spark, tmp_path):
    """Both edges at once: empty source into a zero-file table."""
    t = str(tmp_path / "t")
    _zero_file_table(spark, t)
    delta_log.upsert_delta_log(
        spark, _empty_src(spark), t, keys=["k"], delete_missing=True
    )
    delta_log.upsert_delta_log(spark, _empty_src(spark), t, keys=["k"])
    delta_log.merge_delta_log(
        spark,
        _empty_src(spark),
        t,
        keys=["k"],
        clauses=[{"when": "not_matched", "action": "insert"}],
    )
    assert _rows(spark, t) == set()
    # every intermediate version still time-travels
    for v in range(delta_log.resolve_snapshot(t)["version"] + 1):
        delta_log.read_delta(spark, t, version_as_of=v).collect()


def test_create_table_from_empty_source(spark, tmp_path):
    """v0 created by an upsert whose source is empty: a valid empty
    table whose schema is committed and which accepts later writes."""
    t = str(tmp_path / "t")
    delta_log.upsert_delta_log(spark, _empty_src(spark), t, keys=["k"])
    assert _rows(spark, t) == set()
    delta_log.upsert_delta_log(
        spark, _src(spark, [(1, 1)]), t, keys=["k"], delete_missing=True
    )
    assert _rows(spark, t) == {(1, 1)}
