"""Python DataSource API face of the log-backed Delta engine
(sources/python_datasource.py): batch parity with read_delta (DVs,
time travel, renamed columns, partitioned tables), and the streaming
source's delta-spark contract (append tailing, checkpoint resume,
change-commit rejection, skipChangeCommits)."""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.sources import delta_log as dl
from medallion_delta_lake_spark.sources import python_datasource as pds


@pytest.fixture(scope="module")
def dspark(spark):
    pds.register(spark)
    return spark


def _mk(spark, tmp_path, rows, name="t", partition_by=None):
    p = str(tmp_path / name)
    df = spark.createDataFrame(rows, "id long, v string").coalesce(2)
    dl.write_delta(spark, df, p, partition_by=partition_by)
    return p


def _batch(spark, p, **opts):
    r = spark.read.format(pds.FORMAT_NAME).option("path", p)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_matches_read_delta_with_dv_and_rename(dspark, tmp_path):
    p = _mk(dspark, tmp_path, [(i, f"v{i}") for i in range(10)])
    dl.delete_delta_log(dspark, p, [("id", "=", 3)])
    dl.enable_column_mapping(p)
    dl.rename_column(p, "v", "label")
    via_ds = {(r.id, r.label) for r in _batch(dspark, p).collect()}
    via_engine = {
        (r.id, r.label) for r in dl.read_delta(dspark, p).collect()
    }
    assert via_ds == via_engine
    assert (3, "v3") not in via_ds and len(via_ds) == 9


def test_batch_time_travel(dspark, tmp_path):
    p = _mk(dspark, tmp_path, [(1, "a")])
    dl.write_delta(
        dspark,
        dspark.createDataFrame([(2, "b")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    assert _batch(dspark, p).count() == 2
    assert _batch(dspark, p, versionAsOf="0").count() == 1


def test_batch_partitioned_table(dspark, tmp_path):
    p = str(tmp_path / "pt")
    df = dspark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(12)],
        "id long, grp int, v string",
    )
    dl.write_delta(dspark, df, p, partition_by=["grp"])
    got = {
        (r.id, r.grp, r.v) for r in _batch(dspark, p).collect()
    }
    assert got == {(i, i % 3, f"v{i}") for i in range(12)}
    # partition column round-trips at its declared int type
    assert dict(_batch(dspark, p).dtypes)["grp"] == "int"


def _run_stream(spark, p, ck, out, skip=False):
    sdf = (
        spark.readStream.format(pds.FORMAT_NAME)
        .option("path", p)
        .option("startingVersion", "0")
        .option("skipChangeCommits", "true" if skip else "false")
        .load()
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_appends_resume_and_change_commits(dspark, tmp_path):
    p = _mk(dspark, tmp_path, [(1, "a")])
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    dl.write_delta(
        dspark,
        dspark.createDataFrame([(2, "b")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    _run_stream(dspark, p, ck, out)
    got = {(r.id, r.v) for r in dspark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b")}
    # resume from the checkpoint: only NEW rows flow
    dl.write_delta(
        dspark,
        dspark.createDataFrame(
            [(3, "c"), (4, "d")], "id long, v string"
        ).coalesce(1),
        p,
        mode="append",
    )
    _run_stream(dspark, p, ck, out)
    got = {(r.id, r.v) for r in dspark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    # a data-changing commit fails the append-only stream...
    dl.delete_delta_log(dspark, p, [("id", "=", 1)])
    dl.write_delta(
        dspark,
        dspark.createDataFrame([(5, "e")], "id long, v string").coalesce(1),
        p,
        mode="append",
    )
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    with pytest.raises(StreamingQueryException):
        _run_stream(dspark, p, ck, out)
    # ...unless skipChangeCommits skips it; the later append flows
    _run_stream(dspark, p, ck, out, skip=True)
    got = {(r.id, r.v) for r in dspark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")}


def test_optimize_commit_is_silent_for_stream(dspark, tmp_path):
    p = _mk(dspark, tmp_path, [(i, f"v{i}") for i in range(6)])
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _run_stream(dspark, p, ck, out)
    n0 = dspark.read.parquet(out).count()
    dl.optimize_delta_log(dspark, p, target_file_bytes=1 << 20)
    _run_stream(dspark, p, ck, out)  # dataChange=false: nothing new
    assert dspark.read.parquet(out).count() == n0


def test_id_mode_routes_to_engine_reader(dspark, tmp_path):
    p = _mk(dspark, tmp_path, [(1, "a")])
    snap = dl.resolve_snapshot(p)
    meta = dict(snap["meta"])
    conf = dict(meta.get("configuration") or {})
    conf["delta.columnMapping.mode"] = "id"
    meta["configuration"] = conf
    with pytest.raises(NotImplementedError):
        pds._partitions_for(p, meta, snap["files"])


def test_format_write_create_append_overwrite(dspark, tmp_path):
    p = str(tmp_path / "w")
    df = dspark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "id long, v string"
    ).repartition(2)
    df.write.format(pds.FORMAT_NAME).option("path", p).mode(
        "append"
    ).save()
    assert dl.is_delta_table(p)
    assert dl.read_delta(dspark, p).count() == 6
    dspark.createDataFrame([(9, "x")], "id long, v string").coalesce(
        1
    ).write.format(pds.FORMAT_NAME).option("path", p).mode(
        "append"
    ).save()
    # round-trip: format write -> format read
    got = {
        (r.id, r.v)
        for r in _batch(dspark, p).collect()
    }
    assert got == {(i, f"v{i}") for i in range(6)} | {(9, "x")}
    dspark.createDataFrame([(1, "only")], "id long, v string").coalesce(
        1
    ).write.format(pds.FORMAT_NAME).option("path", p).mode(
        "overwrite"
    ).save()
    assert [(r.id, r.v) for r in _batch(dspark, p).collect()] == [
        (1, "only")
    ]
    # overwrite is a logical delete: time travel still works
    assert _batch(dspark, p, versionAsOf="1").count() == 7
    # stats land on the adds (data skipping works for format writes)
    snap = dl.resolve_snapshot(p)
    assert all("stats" in a for a in snap["files"].values())


def test_format_write_schema_mismatch_rejected(dspark, tmp_path):
    p = str(tmp_path / "w2")
    dspark.createDataFrame([(1, "a")], "id long, v string").coalesce(
        1
    ).write.format(pds.FORMAT_NAME).option("path", p).mode(
        "append"
    ).save()
    with pytest.raises(Exception, match="schema mismatch"):
        dspark.createDataFrame([(1.5,)], "x double").write.format(
            pds.FORMAT_NAME
        ).option("path", p).mode("append").save()


def test_format_write_assigns_row_tracking_ids(dspark, tmp_path):
    """Format writes flow through _commit_version, so a row-tracked
    table gets baseRowIds on format-written files too."""
    p = str(tmp_path / "w3")
    dspark.createDataFrame([(1, "a")], "id long, v string").coalesce(
        1
    ).write.format(pds.FORMAT_NAME).option("path", p).mode(
        "append"
    ).save()
    dl.enable_row_tracking(p)
    dspark.createDataFrame(
        [(2, "b"), (3, "c")], "id long, v string"
    ).coalesce(1).write.format(pds.FORMAT_NAME).option(
        "path", p
    ).mode("append").save()
    ids = {
        r.id: r._row_id
        for r in dl.read_delta_row_ids(dspark, p).collect()
    }
    assert sorted(ids.values()) == [0, 1, 2]


def _run_sink_stream(spark, src_dir, schema, target, ck, app_id=None):
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    w = (
        sdf.writeStream.format(pds.FORMAT_NAME)
        .option("path", target)
        .option("checkpointLocation", ck)
    )
    if app_id:
        w = w.option("txnAppId", app_id)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(120)


def test_stream_writer_appends_and_resumes(dspark, tmp_path):
    """writeStream.format('mdls_delta'): microbatches land as one log
    commit each, carrying txn actions; a checkpoint resume ships only
    new source files."""
    target = _mk(dspark, tmp_path, [(0, "seed")], name="sink_t")
    v0 = dl.resolve_snapshot(target)["version"]
    src = str(tmp_path / "src")
    ck = str(tmp_path / "sink_ck")
    df = dspark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    df.filter("id = 1").coalesce(1).write.parquet(src)
    df.filter("id = 2").coalesce(1).write.mode("append").parquet(src)

    _run_sink_stream(dspark, src, df.schema, target, ck)
    got = {
        (r.id, r.v)
        for r in dl.read_delta(dspark, target).collect()
    }
    assert got == {(0, "seed"), (1, "a"), (2, "b")}
    snap = dl.resolve_snapshot(target)
    assert snap["version"] == v0 + 2  # one commit per microbatch
    assert max(snap["txns"].values()) == 1  # batchIds 0 and 1

    # checkpoint resume: a third source file flows, nothing replays
    dspark.createDataFrame(
        [(3, "c")], "id long, v string"
    ).coalesce(1).write.mode("append").parquet(src)
    _run_sink_stream(dspark, src, df.schema, target, ck)
    got = {
        (r.id, r.v)
        for r in dl.read_delta(dspark, target).collect()
    }
    assert got == {(0, "seed"), (1, "a"), (2, "b"), (3, "c")}


def test_stream_writer_duplicate_batch_is_dropped(dspark, tmp_path):
    """The txn (SetTransaction) gate: committing the same batchId
    twice for one appId must be a no-op — staged files are unlinked,
    the table content and version are unchanged."""
    target = _mk(dspark, tmp_path, [(0, "seed")], name="dup_t")
    schema = dl.read_delta(dspark, target).schema
    w = pds._StreamWriter(
        {"path": target, "txnappid": "app-x"}, schema
    )
    from pyspark.sql import Row

    msg1 = w.write(iter([Row(id=1, v="a")]))
    w.commit([msg1], 0)
    v1 = dl.resolve_snapshot(target)["version"]
    n1 = dl.read_delta(dspark, target).count()

    msg2 = w.write(iter([Row(id=9, v="dup-replay")]))
    w.commit([msg2], 0)  # same batchId: must be dropped
    snap = dl.resolve_snapshot(target)
    assert snap["version"] == v1
    assert dl.read_delta(dspark, target).count() == n1
    # the replayed staging file is gone
    assert not os.path.exists(os.path.join(target, msg2.rel_path))
    # a HIGHER batchId commits normally
    msg3 = w.write(iter([Row(id=2, v="b")]))
    w.commit([msg3], 1)
    assert dl.read_delta(dspark, target).count() == n1 + 1


def test_stream_writer_guards(dspark, tmp_path):
    """Nonexistent target and schema mismatch fail fast on the
    driver; abort unlinks staged files."""
    from pyspark.sql.types import LongType, StringType
    from pyspark.sql.types import StructField as SF
    from pyspark.sql.types import StructType as ST

    schema = ST([SF("id", LongType()), SF("v", StringType())])
    with pytest.raises(ValueError, match="not a Delta table"):
        pds._StreamWriter({"path": str(tmp_path / "nope")}, schema)

    target = _mk(dspark, tmp_path, [(0, "seed")], name="guard_t")
    bad = ST([SF("id", LongType()), SF("other", LongType())])
    with pytest.raises(ValueError, match="schema mismatch"):
        pds._StreamWriter({"path": target}, bad)

    w = pds._StreamWriter({"path": target}, schema)
    from pyspark.sql import Row

    msg = w.write(iter([Row(id=5, v="x")]))
    assert os.path.exists(os.path.join(target, msg.rel_path))
    w.abort([msg], 0)
    assert not os.path.exists(os.path.join(target, msg.rel_path))
