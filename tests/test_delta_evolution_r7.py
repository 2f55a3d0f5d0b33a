"""Round-7 Delta log engine behaviors: additive mergeSchema evolution
on log-native appends (the reference's `.option('mergeSchema','true')`
on every bronze append, bronze_table_creation.py:26,31,41,46,51,56),
plus the r6 ADVICE fixes — multi-part checkpoint replay without the
optional `parts` field, part-count-independent completeness checks,
and the id-mode read no longer leaking session conf."""

from __future__ import annotations

import json
import os

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.sources import delta_log


def test_merge_schema_additive_append(spark, tmp_path):
    """Append with merge_schema=True and one extra column: the table's
    schemaString widens, old rows read back null-filled, and the write
    succeeds where the default validator raises."""
    t = str(tmp_path / "evolve")
    delta_log.write_delta(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
    )
    wide = spark.createDataFrame(
        [(2, "b", 0.5)], "id long, v string, w double"
    )
    # without merge_schema: still the hard rejection
    with pytest.raises(delta_log.DeltaSchemaMismatchError):
        delta_log.write_delta(spark, wide, t, mode="append")
    delta_log.write_delta(spark, wide, t, mode="append", merge_schema=True)

    out = delta_log.read_delta(spark, t)
    assert out.columns == ["id", "v", "w"]  # committed order, new last
    got = {(r.id, r.v, r.w) for r in out.collect()}
    assert got == {(1, "a", None), (2, "b", 0.5)}

    # the committed metaData carries the widened schema (one commit)
    snap = delta_log.resolve_snapshot(t)
    fields = json.loads(snap["meta"]["schemaString"])["fields"]
    assert [f["name"] for f in fields] == ["id", "v", "w"]
    assert fields[-1]["nullable"] is True

    # subsequent plain appends validate against the EVOLVED schema
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(3, "c", 1.5)], "id long, v string, w double"
        ),
        t,
        mode="append",
    )
    assert delta_log.read_delta(spark, t).count() == 3
    # pre-evolution version still time-travels with the old schema
    v0 = delta_log.read_delta(spark, t, version_as_of=0)
    assert v0.columns == ["id", "v"]


def test_merge_schema_missing_columns_null_fill(spark, tmp_path):
    """mergeSchema also accepts a SUBSET frame (a feed that stopped
    sending an optional column): staged files simply lack it and reads
    null-fill — no metaData change needed."""
    t = str(tmp_path / "subset")
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(1, "a", 0.5)], "id long, v string, w double"),
        t,
    )
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        t,
        mode="append",
        merge_schema=True,
    )
    got = {
        (r.id, r.v, r.w) for r in delta_log.read_delta(spark, t).collect()
    }
    assert got == {(1, "a", 0.5), (2, "b", None)}
    # no new columns → schemaString unchanged
    snap = delta_log.resolve_snapshot(t)
    names = [
        f["name"]
        for f in json.loads(snap["meta"]["schemaString"])["fields"]
    ]
    assert names == ["id", "v", "w"]


def test_merge_schema_non_additive_still_raises(spark, tmp_path):
    """A common column changing type or a partitioning change is NOT
    additive — merge_schema must refuse it (evolution never silently
    rewrites meaning)."""
    t = str(tmp_path / "nonadd")
    delta_log.write_delta(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
    )
    retyped = spark.createDataFrame([(1, 2)], "id long, v long")
    with pytest.raises(delta_log.DeltaSchemaMismatchError):
        delta_log.write_delta(
            spark, retyped, t, mode="append", merge_schema=True
        )
    with pytest.raises(delta_log.DeltaSchemaMismatchError):
        delta_log.write_delta(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
            mode="append",
            merge_schema=True,
            partition_by=["v"],
        )


def test_merge_schema_partitioned_append(spark, tmp_path):
    """Evolution composes with hive partitioning: the new column lands
    in the data files, the partition column stays a directory key."""
    t = str(tmp_path / "evpart")
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, part string"),
        t,
        partition_by=["part"],
    )
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(3, "y", 9)], "id long, part string, n int"),
        t,
        mode="append",
        merge_schema=True,
    )
    out = delta_log.read_delta(spark, t)
    got = {(r.id, r.part, r.n) for r in out.collect()}
    assert got == {(1, "x", None), (2, "y", None), (3, "y", 9)}


def test_sync_merge_unpartitioned_is_file_scoped(spark, tmp_path):
    """delete_missing=True MERGE on an UNPARTITIONED table rewrites
    only the files holding a deleted or changed key — not the whole
    snapshot (round-7: the last O(table)-rewrite posture closed). A
    1-update + 1-delete sync against a ~10-file table must commit
    remove actions for at most the 2 host files."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "syncscope")
    base = (
        spark.range(200)
        .withColumn("v", F.col("id") * 10)
        .repartitionByRange(10, "id")
        .sortWithinPartitions("id")
    )
    delta_log.write_delta(spark, base, t, mode="overwrite")
    n_files = len(delta_log.resolve_snapshot(t)["files"])
    assert n_files >= 8

    # full-source sync: every key unchanged EXCEPT id=7 updated and
    # id=150 absent (deleted); one brand-new key 1000 inserted
    rows = [
        (i, 999 if i == 7 else i * 10) for i in range(200) if i != 150
    ] + [(1000, 1)]
    src = spark.createDataFrame(rows, "id long, v long")
    v = delta_log.upsert_delta_log(
        spark, src, t, keys=["id"], delete_missing=True
    )

    log = os.path.join(t, "_delta_log", f"{v:020d}.json")
    acts = [json.loads(line) for line in open(log)]
    removed = sum(1 for a in acts if a.get("remove"))
    assert 0 < removed <= 2, removed  # only the hosts of ids 7 and 150
    info = next(a["commitInfo"] for a in acts if a.get("commitInfo"))
    assert info["operationParameters"]["scope"] == "file-sync"

    got = {r.id: r.v for r in delta_log.read_delta(spark, t).collect()}
    expect = {i: i * 10 for i in range(200) if i != 150}
    expect[7] = 999
    expect[1000] = 1
    assert got == expect
    # prior version still time-travels
    old = delta_log.read_delta(spark, t, version_as_of=v - 1)
    assert old.count() == 200


def test_sync_merge_is_file_scoped_within_partitions(spark, tmp_path):
    """On a PARTITIONED table the sync merge is file-granular INSIDE
    partitions too (round-7; the r6 posture rewrote whole touched
    partitions): a 1-key update in a many-file partition rewrites only
    that key's host file — sibling files of the same partition ride
    through the commit untouched."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "syncpart")
    # one partition, ~6 range-clustered files inside it
    base = (
        spark.range(120)
        .select(
            F.col("id"),
            (F.col("id") * 10).alias("v"),
            F.lit("p0").alias("part"),
        )
        .repartitionByRange(6, "id")
        .sortWithinPartitions("id")
    )
    delta_log.write_delta(
        spark, base, t, mode="overwrite", partition_by=["part"]
    )
    n_files = len(delta_log.resolve_snapshot(t)["files"])
    assert n_files >= 5

    rows = [
        (i, 999 if i == 60 else i * 10, "p0") for i in range(120)
    ]
    src = spark.createDataFrame(rows, "id long, v long, part string")
    v = delta_log.upsert_delta_log(
        spark, src, t, keys=["id"], delete_missing=True
    )
    acts = [
        json.loads(line)
        for line in open(
            os.path.join(t, "_delta_log", f"{v:020d}.json")
        )
    ]
    assert sum(1 for a in acts if a.get("remove")) == 1  # host of id=60
    got = {r.id: r.v for r in delta_log.read_delta(spark, t).collect()}
    assert got[60] == 999 and got[0] == 0 and len(got) == 120


def test_sync_merge_no_change_is_metadata_only(spark, tmp_path):
    """Re-syncing an identical source must rewrite NOTHING — the
    commit carries no remove and no data-bearing add actions."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "syncnoop")
    base = spark.range(40).withColumn("v", F.col("id") + 1)
    delta_log.write_delta(
        spark, base.repartitionByRange(4, "id"), t, mode="overwrite"
    )
    src = spark.range(40).withColumn("v", F.col("id") + 1)
    v = delta_log.upsert_delta_log(
        spark, src, t, keys=["id"], delete_missing=True
    )
    acts = [
        json.loads(line)
        for line in open(
            os.path.join(t, "_delta_log", f"{v:020d}.json")
        )
    ]
    assert sum(1 for a in acts if a.get("remove")) == 0
    assert sum(1 for a in acts if a.get("add")) == 0
    assert delta_log.read_delta(spark, t).count() == 40


def test_sync_merge_matches_dict_model(spark, tmp_path):
    """Model-based check: a chain of full-source syncs (updates,
    deletes, inserts mixed) keeps the table equal to the dict model —
    the file-scoped path must be semantics-identical to the old
    whole-snapshot overwrite."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "syncmodel")
    delta_log.write_delta(
        spark,
        spark.range(30)
        .withColumn("v", F.col("id"))
        .repartitionByRange(3, "id"),
        t,
        mode="overwrite",
    )
    model = {i: i for i in range(30)}
    steps = [
        # drop 5 keys, change 2, add 1
        {**{i: i for i in range(25) if i != 7}, 7: 700, 12: 120, 60: 6},
        # drop everything below 10
        {**{i: i for i in range(10, 25) if i != 12}, 12: 121, 60: 6},
        # grow back
        {i: i * 2 for i in range(40)},
    ]
    for snapshot in steps:
        src = spark.createDataFrame(
            list(snapshot.items()), "id long, v long"
        )
        delta_log.upsert_delta_log(
            spark, src, t, keys=["id"], delete_missing=True
        )
        model = dict(snapshot)
        got = {
            r.id: r.v for r in delta_log.read_delta(spark, t).collect()
        }
        assert got == model


def test_multipart_checkpoint_without_parts_field(spark, tmp_path):
    """_last_checkpoint's `parts` field is OPTIONAL: a third-party
    writer may omit it even for a multi-part checkpoint, and replay
    must still apply EVERY part — part 1 alone would silently drop the
    add actions carried by the others (ADVICE r6, medium)."""
    t = str(tmp_path / "noparts")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id long, v string"
    )
    delta_log.write_delta(spark, df.repartition(4), t)
    assert delta_log.write_checkpoint(t, parts=3) == 0
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, "_last_checkpoint")) as fh:
        info = json.load(fh)
    assert info.get("parts") == 3
    del info["parts"]
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump(info, fh)
    # remove the JSON commit the checkpoint covers: replay must come
    # entirely from the checkpoint parts
    os.remove(os.path.join(log, "00000000000000000000.json"))
    got = {(r.id, r.v) for r in delta_log.read_delta(spark, t).collect()}
    assert got == {(i, f"v{i}") for i in range(8)}


def test_mixed_part_count_sets_validated_independently(spark, tmp_path):
    """Two multi-part checkpoint attempts with different part counts at
    one version: an INCOMPLETE set must be ignored even when its
    fragment count happens to look complete when mixed with the other
    set's (ADVICE r6: key completeness by (version, n))."""
    t = str(tmp_path / "mixed")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "id long, v string"
    )
    delta_log.write_delta(spark, df.repartition(3), t)
    delta_log.write_checkpoint(t, parts=2)  # complete 2-part set
    log = os.path.join(t, "_delta_log")
    # fabricate an INCOMPLETE 3-part attempt: only part 1 of 3 exists
    # (a crashed writer); its content is a copy of the complete set's
    # part 1 — if fragments merged across counts, {1of3, 2of2} could
    # masquerade as a complete 2-set with wrong content
    import shutil

    shutil.copy(
        os.path.join(
            log,
            "00000000000000000000.checkpoint.0000000001.0000000002.parquet",
        ),
        os.path.join(
            log,
            "00000000000000000000.checkpoint.0000000001.0000000003.parquet",
        ),
    )
    found = delta_log._discover_checkpoints(log)
    assert sorted(os.path.basename(f) for f in found[0]) == [
        "00000000000000000000.checkpoint.0000000001.0000000002.parquet",
        "00000000000000000000.checkpoint.0000000002.0000000002.parquet",
    ]
    # and a cold read (no _last_checkpoint, no JSON) replays correctly
    os.remove(os.path.join(log, "_last_checkpoint"))
    os.remove(os.path.join(log, "00000000000000000000.json"))
    got = {(r.id, r.v) for r in delta_log.read_delta(spark, t).collect()}
    assert got == {(i, f"v{i}") for i in range(6)}


def test_delete_big_per_file_delete_rewrites_not_dv(spark, tmp_path):
    """DELETE classification is made from per-file match COUNTS, never
    an unbounded index collect (round-7): a predicate deleting ~99% of
    one file's rows rewrites that file (a DV that large is overhead
    and its indexes would sit in driver memory), while a small delete
    on the same table still produces a DV; reads, time travel and the
    change feed stay exact either way."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "dvcap")
    df = spark.range(100).withColumn("v", F.col("id") * 2).coalesce(1)
    delta_log.write_delta(spark, df, t, mode="overwrite")

    # 99-row delete out of 100 → rewrite (fraction-triggered)
    r = delta_log.delete_delta_log(spark, t, [("id", "<", 99)])
    assert r["deleted_rows"] == 99
    assert r["files_rewritten"] == 1
    assert r["files_removed"] == 0 and r["files_with_new_dv"] == 0
    assert [x.id for x in delta_log.read_delta(spark, t).collect()] == [99]
    snap = delta_log.resolve_snapshot(t)
    assert not any(
        a.get("deletionVector") for a in snap["files"].values()
    )
    # no DV was ever created → no protocol upgrade needed
    proto = snap["protocol"] or {"minReaderVersion": 1}
    assert proto["minReaderVersion"] == 1

    # row-count cap triggers independently of the fraction
    t2 = str(tmp_path / "dvcap2")
    delta_log.write_delta(
        spark,
        spark.range(1000).withColumn("v", F.col("id")).coalesce(1),
        t2,
        mode="overwrite",
    )
    r2 = delta_log.delete_delta_log(
        spark, t2, [("id", "<", 100)], max_dv_rows_per_file=50
    )
    assert r2["files_rewritten"] == 1 and r2["files_with_new_dv"] == 0
    assert delta_log.read_delta(spark, t2).count() == 900

    # a small delete on the rewritten table still uses a DV
    r3 = delta_log.delete_delta_log(spark, t2, [("id", "=", 500)])
    assert r3["files_with_new_dv"] == 1 and r3["files_rewritten"] == 0
    assert delta_log.read_delta(spark, t2).count() == 899
    # time travel across the rewrite+DV chain
    assert (
        delta_log.read_delta(spark, t2, version_as_of=0).count() == 1000
    )
    assert (
        delta_log.read_delta(
            spark, t2, version_as_of=r2["version"]
        ).count()
        == 900
    )
    # change feed: the rewrite commit nets to -100 rows
    cdf = delta_log.table_changes(spark, t2, r2["version"], r2["version"])
    by_kind = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_kind.get("delete", 0) - by_kind.get("insert", 0) == 100


def test_delete_null_predicate_rows_survive_rewrite(spark, tmp_path):
    """Rows where the DELETE predicate evaluates to NULL are kept by
    the rewrite path, matching the DV path's filter(cond) semantics."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "dvnull")
    df = spark.createDataFrame(
        [(i, None if i % 10 == 0 else i) for i in range(100)],
        "id long, v long",
    ).coalesce(1)
    delta_log.write_delta(spark, df, t, mode="overwrite")
    # v < 95 matches 85 non-null rows (0.85 ≥ fraction) → rewrite;
    # the 10 NULL-v rows must survive
    r = delta_log.delete_delta_log(spark, t, [("v", "<", 95)])
    assert r["files_rewritten"] == 1
    got = sorted(
        x.id for x in delta_log.read_delta(spark, t).collect()
    )
    assert got == [i for i in range(100) if i % 10 == 0 or i >= 95]


def test_append_only_table_refuses_mutations(spark, tmp_path):
    """delta.appendOnly=true: appends still land, but overwrite,
    MERGE, and DELETE raise (the appendOnly writer feature — existing
    data can never be removed or changed); OPTIMIZE remains allowed
    (dataChange=false maintenance)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "aponly")
    delta_log.write_delta(
        spark, spark.range(10).withColumn("v", F.col("id")), t
    )
    delta_log.set_table_properties(t, {"delta.appendOnly": "true"})

    delta_log.write_delta(
        spark,
        spark.createDataFrame([(100, 1)], "id long, v long"),
        t,
        mode="append",
    )
    assert delta_log.read_delta(spark, t).count() == 11

    with pytest.raises(delta_log.DeltaProtocolError):
        delta_log.write_delta(
            spark,
            spark.createDataFrame([(0, 0)], "id long, v long"),
            t,
            mode="overwrite",
        )
    with pytest.raises(delta_log.DeltaProtocolError):
        delta_log.upsert_delta_log(
            spark,
            spark.createDataFrame([(0, 99)], "id long, v long"),
            t,
            keys=["id"],
        )
    with pytest.raises(delta_log.DeltaProtocolError):
        delta_log.delete_delta_log(spark, t, [("id", "<", 5)])
    # maintenance (dataChange=false) still allowed
    delta_log.optimize_delta_log(spark, t, target_file_bytes=1 << 20)
    assert delta_log.read_delta(spark, t).count() == 11


def test_check_constraints_enforced_on_writes(spark, tmp_path):
    """CHECK constraints: adding one validates existing data first;
    later appends and merges violating it raise; NULL passes (the
    SQL-standard semantics); dropping it re-opens the gate."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "ck")
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, None)], "id long, v long"
        ),
        t,
    )
    # a constraint the current data violates must not commit
    with pytest.raises(delta_log.DeltaInvariantViolationError):
        delta_log.add_check_constraint(spark, t, "v_big", "v > 15")
    delta_log.add_check_constraint(spark, t, "v_pos", "v > 0")
    snap = delta_log.resolve_snapshot(t)
    assert (
        snap["meta"]["configuration"]["delta.constraints.v_pos"]
        == "v > 0"
    )
    # checkConstraints = legacy writer version 3
    assert snap["protocol"]["minWriterVersion"] >= 3

    # violating append refused, row NOT committed
    with pytest.raises(delta_log.DeltaInvariantViolationError):
        delta_log.write_delta(
            spark,
            spark.createDataFrame([(4, -5)], "id long, v long"),
            t,
            mode="append",
        )
    assert delta_log.read_delta(spark, t).count() == 3
    # NULL passes the CHECK (standard semantics)
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(5, None)], "id long, v long"),
        t,
        mode="append",
    )
    # violating MERGE refused too
    with pytest.raises(delta_log.DeltaInvariantViolationError):
        delta_log.upsert_delta_log(
            spark,
            spark.createDataFrame([(1, -1)], "id long, v long"),
            t,
            keys=["id"],
            delete_missing=False,
        )
    delta_log.drop_check_constraint(t, "v_pos")
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(6, -5)], "id long, v long"),
        t,
        mode="append",
    )
    assert delta_log.read_delta(spark, t).count() == 5


def test_not_null_invariant_enforced(spark, tmp_path):
    """A committed schema with nullable=false on a column makes null
    appends refuse (the protocol's Column Invariants / writer v2)."""
    import json as _json

    from pyspark.sql import functions as F

    t = str(tmp_path / "nn")
    delta_log.write_delta(
        spark, spark.range(3).withColumn("v", F.col("id")), t
    )
    # flip v to NOT NULL by rewriting the committed schemaString
    snap = delta_log.resolve_snapshot(t)
    meta = dict(snap["meta"])
    sch = _json.loads(meta["schemaString"])
    for f in sch["fields"]:
        if f["name"] == "v":
            f["nullable"] = False
    meta["schemaString"] = _json.dumps(sch)
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{snap['version'] + 1:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"metaData": meta}) + "\n")

    with pytest.raises(delta_log.DeltaInvariantViolationError):
        delta_log.write_delta(
            spark,
            spark.createDataFrame([(9, None)], "id long, v long"),
            t,
            mode="append",
        )
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(9, 9)], "id long, v long"),
        t,
        mode="append",
    )
    assert delta_log.read_delta(spark, t).count() == 4


def test_v2_checkpoint_write_round_trip(spark, tmp_path):
    """write_checkpoint(v2=True) emits a manifest + sidecar pair a
    cold reader replays (round-7: the write side of the V2 layout the
    reader already supported). The protocol gains the v2Checkpoint
    feature via one upgrade commit when absent; V1 writing unchanged."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "v2ckpt")
    df = spark.range(40).withColumn("v", F.col("id") * 3)
    delta_log.write_delta(spark, df.repartition(3), t)
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(100, 1)], "id long, v long"),
        t,
        mode="append",
    )

    v = delta_log.write_checkpoint(t, v2=True)
    log = os.path.join(t, "_delta_log")
    # one protocol-upgrade commit landed first (feature adoption)
    snap = delta_log.resolve_snapshot(t)
    assert v == snap["version"] == 2
    proto = snap["protocol"]
    assert "v2Checkpoint" in proto["readerFeatures"]
    assert "v2Checkpoint" in proto["writerFeatures"]

    import glob

    manifests = glob.glob(
        os.path.join(log, f"{v:020d}.checkpoint.*.parquet")
    )
    assert len(manifests) == 1
    sidecars = glob.glob(os.path.join(log, "_sidecars", "*.parquet"))
    assert len(sidecars) == 1

    # cold replay purely from the checkpoint: drop every JSON commit
    for f in os.listdir(log):
        if f.endswith(".json") and f[:20].isdigit():
            os.remove(os.path.join(log, f))
    got = {(r.id, r.v) for r in delta_log.read_delta(spark, t).collect()}
    assert got == {(i, i * 3) for i in range(40)} | {(100, 1)}

    # an already-v2 table checkpoints again with NO extra commit
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(101, 2)], "id long, v long"),
        t,
        mode="append",
    )
    v2b = delta_log.write_checkpoint(t, v2=True)
    assert v2b == delta_log.resolve_snapshot(t)["version"]

    # vacuum must never collect sidecar files (they live under
    # _delta_log and are log artifacts, not data files)
    delta_log.vacuum(t, keep_versions=1)
    assert glob.glob(os.path.join(log, "_sidecars", "*.parquet"))
    got = {(r.id, r.v) for r in delta_log.read_delta(spark, t).collect()}
    assert (100, 1) in got and (101, 2) in got

    with pytest.raises(ValueError):
        delta_log.write_checkpoint(t, parts=2, v2=True)


def test_timestamp_time_travel(spark, tmp_path):
    """timestampAsOf: a read at an instant between two commits sees
    the earlier snapshot; a pre-table timestamp raises; commitInfo
    timestamps take precedence over file mtimes when present."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    t = str(tmp_path / "tstravel")
    delta_log.write_delta(
        spark, spark.range(3).withColumn("v", F.col("id")), t
    )
    t0 = _time.time()
    _time.sleep(1.1)
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(50, 1)], "id long, v long"),
        t,
        mode="append",
    )
    assert delta_log.version_at_timestamp(t, t0) == 0
    assert (
        delta_log.read_delta(spark, t, timestamp_as_of=t0).count() == 3
    )
    assert (
        delta_log.read_delta(
            spark, t, timestamp_as_of=_time.time()
        ).count()
        == 4
    )
    with pytest.raises(ValueError):
        delta_log.version_at_timestamp(t, t0 - 10_000)
    with pytest.raises(ValueError):
        delta_log.read_delta(
            spark, t, version_as_of=0, timestamp_as_of=t0
        )
    # commitInfo.timestamp (ms) wins over mtime when present
    log = _os.path.join(t, "_delta_log")
    with open(_os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "commitInfo": {
                        "operation": "X",
                        "timestamp": int((t0 + 3600) * 1000),
                    }
                }
            )
            + "\n"
        )
    assert delta_log.version_at_timestamp(t, t0 + 1800) == 1
    assert delta_log.version_at_timestamp(t, t0 + 7200) == 2


def test_cleanup_log_retention(spark, tmp_path):
    """Log retention: commit JSONs below the newest checkpoint at or
    before the retention cutoff are deleted (replay comes from the
    checkpoint), newer history keeps time-traveling, and cleanup
    without a covering checkpoint is a no-op."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "logret")
    delta_log.write_delta(
        spark, spark.range(5).withColumn("v", F.col("id")), t
    )
    for i in range(6):  # versions 1..6
        delta_log.write_delta(
            spark,
            spark.createDataFrame([(100 + i, 1)], "id long, v long"),
            t,
            mode="append",
        )
    # no checkpoint yet → nothing cleanable
    assert delta_log.cleanup_log(t, keep_versions=2) == []

    delta_log.write_checkpoint(t)  # at version 6
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(200, 2)], "id long, v long"),
        t,
        mode="append",
    )  # version 7
    deleted = delta_log.cleanup_log(t, keep_versions=2)
    # cutoff = 7-1 = 6; checkpoint at 6 covers everything below it
    assert deleted == [f"{v:020d}.json" for v in range(6)]
    # snapshot + recent time travel still work
    assert delta_log.read_delta(spark, t).count() == 12
    assert (
        delta_log.read_delta(spark, t, version_as_of=6).count() == 11
    )
    # time travel below the cleaned range is gone (documented)
    with pytest.raises(Exception):
        delta_log.read_delta(spark, t, version_as_of=2).collect()


def test_changes_since_cursor(spark, tmp_path):
    """Incremental consumption: changes_since returns only the
    commits after the cursor and the new cursor; no advance → None."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "cursor")
    delta_log.write_delta(
        spark, spark.range(3).withColumn("v", F.col("id")), t
    )
    df, cur = delta_log.changes_since(spark, t, -1)
    assert cur == 0 and df.count() == 3
    assert set(df.select("_change_type").distinct().toPandas()["_change_type"]) == {"insert"}

    none_df, cur2 = delta_log.changes_since(spark, t, cur)
    assert none_df is None and cur2 == cur

    delta_log.write_delta(
        spark,
        spark.createDataFrame([(50, 1)], "id long, v long"),
        t,
        mode="append",
    )
    delta_log.delete_delta_log(spark, t, [("id", "=", 0)])
    df2, cur3 = delta_log.changes_since(spark, t, cur)
    assert cur3 == cur + 2
    got = {
        (r.id, r._change_type, r._commit_version)
        for r in df2.collect()
    }
    assert (50, "insert", 1) in got
    assert (0, "delete", 2) in got
    assert len(got) == 2


def test_id_mode_read_leaves_session_conf_alone(spark, tmp_path):
    """The id-mode scan resolves field ids from parquet footers itself;
    it must NOT flip the session-global fieldId.read conf (which is
    consulted at execution time and would leak id-resolution into every
    later parquet read — ADVICE r6)."""
    key = "spark.sql.parquet.fieldId.read.enabled"
    before = spark.conf.get(key, None)
    from tests.test_delta_log_reader import (  # noqa: F401
        _commit,
        _write_parquet,
    )

    t = str(tmp_path / "idmode")
    # physical file with arbitrary names, keyed by field ids
    from pyspark.sql import functions as F

    spark.range(3).select(
        F.col("id").alias("c1", metadata={"parquet.field.id": 10}),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias(
            "c2", metadata={"parquet.field.id": 20}
        ),
    ).coalesce(1).write.mode("overwrite").parquet(t + "__tmp")
    part = next(
        f for f in os.listdir(t + "__tmp") if f.endswith(".parquet")
    )
    os.makedirs(t, exist_ok=True)
    os.replace(os.path.join(t + "__tmp", part), os.path.join(t, "d0.parquet"))

    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {"delta.columnMapping.id": 10},
            },
            {
                "name": "label",
                "type": "string",
                "nullable": True,
                "metadata": {"delta.columnMapping.id": 20},
            },
        ],
    }
    _commit(
        t,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 2,
                    "minWriterVersion": 5,
                }
            },
            {
                "metaData": {
                    "id": "00000000-0000-0000-0000-00000000000a",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "id",
                        "delta.columnMapping.maxColumnId": "20",
                    },
                }
            },
            {
                "add": {
                    "path": "d0.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ],
    )
    got = {
        (r.id, r.label)
        for r in delta_log.read_delta(spark, t).collect()
    }
    assert got == {(0, "s0"), (1, "s1"), (2, "s2")}
    assert spark.conf.get(key, None) == before


def test_convert_to_delta_in_place(spark, tmp_path):
    """CONVERT TO DELTA: an existing hive-partitioned parquet dir
    becomes a log-backed table without moving a single file; stats
    land so skipping works; subsequent Delta ops run normally."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "plainpq")
    df = spark.range(100).select(
        "id",
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 3).cast("int").alias("part"),
    )
    df.write.partitionBy("part").parquet(t)
    files_before = sorted(
        os.path.join(r, n)
        for r, _, ns in os.walk(t)
        for n in ns
        if n.endswith(".parquet")
    )
    v = delta_log.convert_to_delta(spark, t, partition_by=["part"])
    assert v == 0
    files_after = sorted(
        os.path.join(r, n)
        for r, _, ns in os.walk(t)
        for n in ns
        if n.endswith(".parquet") and "_delta_log" not in r
    )
    assert files_before == files_after  # nothing moved or rewritten

    out = delta_log.read_delta(spark, t)
    assert out.count() == 100
    # hive path inference types the partition key (ints here)
    assert {
        r.part for r in out.select("part").distinct().collect()
    } == {0, 1, 2}
    # stats landed → a filtered read prunes and still answers right
    got = delta_log.read_delta(spark, t, filters=[("id", "<", 10)])
    assert got.count() == 10
    # the table now takes normal Delta mutations
    delta_log.upsert_delta_log(
        spark,
        spark.createDataFrame([(1000, 1, 0)], "id long, v long, part int"),
        t,
        keys=["id"],
        delete_missing=False,
    )
    assert delta_log.read_delta(spark, t).count() == 101
    with pytest.raises(ValueError):
        delta_log.convert_to_delta(spark, t)  # already Delta


def test_shallow_clone_zero_copy(spark, tmp_path):
    """SHALLOW CLONE: the clone reads the source's files by absolute
    path with zero data copy; writes to the clone never touch the
    source; DV files travel so DV'd sources clone correctly."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "csrc")
    dst = str(tmp_path / "cdst")
    delta_log.write_delta(
        spark,
        spark.range(50).withColumn("v", F.col("id")).repartition(3),
        src,
    )
    delta_log.delete_delta_log(spark, src, [("id", "=", 7)])  # add a DV
    delta_log.clone_delta(src, dst)

    # zero data-file copy: dst holds no parquet outside its log
    dst_parquet = [
        n
        for r, _, ns in os.walk(dst)
        for n in ns
        if n.endswith(".parquet") and "_delta_log" not in r
    ]
    assert dst_parquet == []
    got = {r.id for r in delta_log.read_delta(spark, dst).collect()}
    assert got == set(range(50)) - {7}

    # writes diverge: clone mutates, source unchanged
    delta_log.upsert_delta_log(
        spark,
        spark.createDataFrame([(0, 999)], "id long, v long"),
        dst,
        keys=["id"],
        delete_missing=False,
    )
    assert {
        r.v
        for r in delta_log.read_delta(spark, dst)
        .filter(F.col("id") == 0)
        .collect()
    } == {999}
    assert {
        r.v
        for r in delta_log.read_delta(spark, src)
        .filter(F.col("id") == 0)
        .collect()
    } == {0}
    # distinct table ids
    assert (
        delta_log.resolve_snapshot(src)["meta"]["id"]
        != delta_log.resolve_snapshot(dst)["meta"]["id"]
    )


def test_generated_columns(spark, tmp_path):
    """Generated columns (writer v4): declared at creation via
    ``delta.generationExpression`` field metadata; absent on write →
    the writer computes them; present-but-wrong → refuse; correct
    explicit values pass."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "gencol")
    base = spark.range(5).select(
        "id",
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 2).cast("int").alias(
            "id_bucket", metadata={"delta.generationExpression": "id % 2"}
        ),
    )
    delta_log.write_delta(spark, base, t)
    proto = delta_log.resolve_snapshot(t)["protocol"]
    assert proto["minWriterVersion"] == 4

    # absent generated column: writer fills it
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(10, 20), (11, 22)], "id long, v long"),
        t,
        mode="append",
    )
    got = {
        r.id: r.id_bucket
        for r in delta_log.read_delta(spark, t).collect()
    }
    assert got[10] == 0 and got[11] == 1 and len(got) == 7

    # wrong explicit value: refused
    with pytest.raises(delta_log.DeltaInvariantViolationError):
        delta_log.write_delta(
            spark,
            spark.createDataFrame(
                [(12, 24, 9)], "id long, v long, id_bucket int"
            ),
            t,
            mode="append",
        )
    # correct explicit value: accepted
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(12, 24, 0)], "id long, v long, id_bucket int"
        ),
        t,
        mode="append",
    )
    assert delta_log.read_delta(spark, t).count() == 8


def test_delete_family_matches_dict_model(spark, tmp_path):
    """Model-based DELETE: random predicates with random DV caps and
    rewrite fractions — whatever mix of inline-DV / file-DV / rewrite /
    full-remove the classifier picks, the surviving rows must equal
    the dict model and every prior version must stay time-travelable."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    pred = st.tuples(
        st.sampled_from(["<", "<=", ">", ">=", "="]),
        st.integers(-5, 55),
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        steps=st.lists(pred, min_size=1, max_size=3),
        cap=st.sampled_from([1, 5, 100_000]),
        frac=st.sampled_from([0.3, 0.8, 1.1]),
    )
    def run(steps, cap, frac):
        import uuid

        t = str(tmp_path / f"dmodel{uuid.uuid4().hex[:8]}")
        delta_log.write_delta(
            spark,
            spark.range(50).withColumn("v", F.col("id") * 3).repartition(4),
            t,
            mode="overwrite",
        )
        model = {i: i * 3 for i in range(50)}
        ops = {
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
            "=": lambda a, b: a == b,
        }
        versions = [dict(model)]
        for op, val in steps:
            delta_log.delete_delta_log(
                spark,
                t,
                [("id", op, val)],
                max_dv_rows_per_file=cap,
                rewrite_fraction=frac,
            )
            model = {
                k: x for k, x in model.items() if not ops[op](k, val)
            }
            versions.append(dict(model))
            got = {
                r.id: r.v
                for r in delta_log.read_delta(spark, t).collect()
            }
            assert got == model, (op, val, cap, frac)
        # every intermediate state still time-travels exactly
        for v, expect in enumerate(versions):
            got = {
                r.id: r.v
                for r in delta_log.read_delta(
                    spark, t, version_as_of=v
                ).collect()
            }
            assert got == expect, (v, cap, frac)

    run()


def test_merge_schema_chain_matches_model(spark, tmp_path):
    """Model-based mergeSchema: a random chain of appends, each
    carrying a random subset of known columns plus possibly a brand-new
    one, must equal the null-filled union model at every step, with
    the committed schema = first-seen column order."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    pool = ["c1", "c2", "c3", "c4"]
    step = st.tuples(
        st.lists(st.sampled_from(pool), min_size=0, max_size=3, unique=True),
        st.integers(1, 3),  # rows in the batch
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(steps=st.lists(step, min_size=1, max_size=4))
    def run(steps):
        import uuid

        t = str(tmp_path / f"evmodel{uuid.uuid4().hex[:8]}")
        delta_log.write_delta(
            spark,
            spark.createDataFrame([(0, 0)], "id long, base long"),
            t,
        )
        model = [{"id": 0, "base": 0}]
        known = ["id", "base"]
        next_id = 1
        for extra_cols, n_rows in steps:
            cols = ["id"] + extra_cols
            rows = []
            for _ in range(n_rows):
                rows.append(
                    tuple([next_id] + [next_id * 10] * len(extra_cols))
                )
                model.append(
                    {"id": next_id, **{c: next_id * 10 for c in extra_cols}}
                )
                next_id += 1
            schema = ", ".join(f"{c} long" for c in cols)
            delta_log.write_delta(
                spark,
                spark.createDataFrame(rows, schema),
                t,
                mode="append",
                merge_schema=True,
            )
            for c in extra_cols:
                if c not in known:
                    known.append(c)
            got_df = delta_log.read_delta(spark, t)
            assert got_df.columns == known  # first-seen order
            got = sorted(
                tuple(r[c] for c in known) for r in got_df.collect()
            )
            want = sorted(
                tuple(m.get(c) for c in known) for m in model
            )
            assert got == want

    run()


def test_concurrent_appends_all_land_once(spark, tmp_path):
    """Multi-writer stress: N threads racing appends through the
    O_EXCL commit loop — every batch lands exactly once, versions are
    dense, and no append is lost or doubled."""
    import threading

    from pyspark.sql import functions as F

    t = str(tmp_path / "conc_stress")
    delta_log.write_delta(
        spark, spark.createDataFrame([(0, -1)], "id long, w long"), t
    )
    n_threads, per_thread = 4, 3
    errs: list = []

    def writer(k: int) -> None:
        try:
            for j in range(per_thread):
                delta_log.write_delta(
                    spark,
                    spark.createDataFrame(
                        [(1000 * (k + 1) + j, k)], "id long, w long"
                    ),
                    t,
                    mode="append",
                )
        except Exception as ex:  # pragma: no cover - surfaced below
            errs.append(ex)

    threads = [
        threading.Thread(target=writer, args=(k,))
        for k in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    out = delta_log.read_delta(spark, t)
    assert out.count() == 1 + n_threads * per_thread
    ids = sorted(r.id for r in out.select("id").collect())
    assert len(ids) == len(set(ids))  # nothing doubled
    snap = delta_log.resolve_snapshot(t)
    assert snap["version"] == n_threads * per_thread  # dense versions
    # history shows one commit per append
    hist = delta_log.table_history(t)
    assert len(hist) == n_threads * per_thread + 1


def test_general_merge_clause_semantics(spark, tmp_path):
    """General MERGE: conditional update + delete + insert +
    by-source clauses with first-true ordering, against a dict model;
    the commit stays file-scoped (untouched files ride through)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "gmerge")
    delta_log.write_delta(
        spark,
        spark.range(20)
        .select(
            "id",
            (F.col("id") * 10).alias("v"),
            F.lit("live").alias("status"),
        )
        .repartitionByRange(4, "id")
        .sortWithinPartitions("id"),
        t,
        mode="overwrite",
    )
    files_v0 = set(delta_log.resolve_snapshot(t)["files"])

    # source: ids 0..5 and 100; id 0 big value, id 1 small, id 2 poison
    src = spark.createDataFrame(
        [(0, 999), (1, 3), (2, -1), (3, 35), (4, 45), (5, 55), (100, 7)],
        "id long, sv long",
    )
    clauses = [
        # ordered matched clauses: poison rows delete FIRST, then big
        # updates, then small ones take a floor value
        {"when": "matched", "action": "delete",
         "condition": "s.sv < 0"},
        {"when": "matched", "action": "update",
         "condition": "s.sv > d.v",
         "set": {"v": "s.sv", "status": "'bumped'"}},
        {"when": "matched", "action": "update",
         "condition": "s.sv <= 5", "set": {"v": "CAST(0 AS BIGINT)"}},
        # unmatched source rows with sv > 0 insert
        {"when": "not_matched", "action": "insert",
         "condition": "s.sv > 0",
         "values": {"id": "s.id", "v": "s.sv",
                    "status": "'new'"}},
        # target rows the source no longer covers get flagged stale
        # when their id is high enough
        {"when": "not_matched_by_source", "action": "update",
         "condition": "d.id >= 18", "set": {"status": "'stale'"}},
    ]
    v = delta_log.merge_delta_log(spark, src, t, ["id"], clauses)

    got = {
        r.id: (r.v, r.status)
        for r in delta_log.read_delta(spark, t).collect()
    }
    model = {i: (i * 10, "live") for i in range(20)}
    del model[2]  # poison deleted
    model[0] = (999, "bumped")  # 999 > 0
    model[1] = (0, "live")  # 3 <= 10 not > v; 3 <= 5 → floor clause
    model[3] = (35, "bumped")  # 35 > 30
    model[4] = (45, "bumped")
    model[5] = (55, "bumped")
    model[100] = (7, "new")
    model[18] = (180, "stale")
    model[19] = (190, "stale")
    assert got == model

    # file scoping: files holding only untouched ids (6..15 region)
    # ride through the commit
    acts = [
        json.loads(line)
        for line in open(
            os.path.join(t, "_delta_log", f"{v:020d}.json")
        )
    ]
    removed = {a["remove"]["path"] for a in acts if a.get("remove")}
    assert removed < files_v0  # strict subset
    info = next(a["commitInfo"] for a in acts if a.get("commitInfo"))
    assert info["operationParameters"]["scope"] == "file-general"
    # time travel to pre-merge
    assert (
        delta_log.read_delta(spark, t, version_as_of=v - 1).count()
        == 20
    )


def test_general_merge_guards(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "gmguard")
    delta_log.write_delta(
        spark, spark.range(5).withColumn("v", F.col("id")), t
    )
    dup_src = spark.createDataFrame(
        [(1, 10), (1, 20)], "id long, sv long"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        delta_log.merge_delta_log(
            spark,
            dup_src,
            t,
            ["id"],
            [
                {"when": "matched", "action": "update",
                 "set": {"v": "s.sv"}}
            ],
        )
    src = spark.createDataFrame([(1, 10)], "id long, sv long")
    with pytest.raises(ValueError, match="key column"):
        delta_log.merge_delta_log(
            spark,
            src,
            t,
            ["id"],
            [
                {"when": "matched", "action": "update",
                 "set": {"id": "s.id + 1"}}
            ],
        )
    with pytest.raises(ValueError, match="must insert"):
        delta_log.merge_delta_log(
            spark, src, t, ["id"],
            [{"when": "not_matched", "action": "update", "set": {}}],
        )


def test_generic_apis_route_to_log_engine(spark, tmp_path):
    """The engine's generic upsert / write_append / write_overwrite /
    delete_keys / compact, pointed at a LOG-BACKED table without
    delta-spark, must mutate THROUGH the transaction log — never the
    parquet-snapshot swap (which would orphan the log and resurrect
    time-traveled files)."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators import upsert as up
    from medallion_delta_lake_spark.sources import writers

    t = str(tmp_path / "route")
    delta_log.write_delta(
        spark, spark.range(10).withColumn("v", F.col("id")), t
    )
    v0 = delta_log.resolve_snapshot(t)["version"]

    # generic upsert → log-native MERGE commit
    up.upsert(
        spark,
        spark.createDataFrame([(3, 99), (50, 1)], "id long, v long"),
        t,
        keys=["id"],
        delete_missing=False,
    )
    snap = delta_log.resolve_snapshot(t)
    assert snap["version"] == v0 + 1  # one commit, log intact
    got = {r.id: r.v for r in delta_log.read_delta(spark, t).collect()}
    assert got[3] == 99 and got[50] == 1 and len(got) == 11

    # generic append → add actions, visible to log readers
    writers.write_append(
        spark.createDataFrame([(60, 2)], "id long, v long"), t
    )
    assert delta_log.read_delta(spark, t).count() == 12

    # delete_keys → MERGE-delete commit, count returned
    n = up.delete_keys(
        spark,
        t,
        delta_log.read_delta(spark, t).filter(F.col("id") >= 50),
        keys=["id"],
    )
    assert n == 2
    assert delta_log.read_delta(spark, t).count() == 10

    # compact → OPTIMIZE commit (log survives, content identical)
    before = {
        (r.id, r.v) for r in delta_log.read_delta(spark, t).collect()
    }
    writers.compact(spark, t, target_files=1, sort_cols=["id"])
    after = {
        (r.id, r.v) for r in delta_log.read_delta(spark, t).collect()
    }
    assert before == after
    assert delta_log.is_delta_table(t)

    # overwrite → remove+add commit, old versions still travel
    writers.write_overwrite(
        spark.createDataFrame([(1, 1)], "id long, v long"), t
    )
    assert delta_log.read_delta(spark, t).count() == 1
    assert delta_log.read_delta(spark, t, version_as_of=v0).count() == 10


def test_update_delta_log(spark, tmp_path):
    """UPDATE: stats-pruned file-scoped rewrite with SQL assignments;
    DV interplay (updated files' deleted rows stay deleted), generated
    columns recompute, invariants hold, partition moves work."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "upd")
    delta_log.write_delta(
        spark,
        spark.range(100)
        .withColumn("v", F.col("id") * 10)
        .repartitionByRange(5, "id")
        .sortWithinPartitions("id"),
        t,
        mode="overwrite",
    )
    r = delta_log.update_delta_log(
        spark, t, [("id", ">=", 90)], {"v": "v + 1"}
    )
    assert r["updated_rows"] == 10
    assert 0 < r["files_rewritten"] <= 2  # range-clustered pruning
    got = {x.id: x.v for x in delta_log.read_delta(spark, t).collect()}
    assert got[95] == 951 and got[10] == 100 and len(got) == 100
    # time travel to pre-update
    v0 = delta_log.read_delta(spark, t, version_as_of=r["version"] - 1)
    assert {x.v for x in v0.filter(F.col("id") == 95).collect()} == {950}

    # UPDATE composes with deletion vectors: DV'd rows stay deleted
    delta_log.delete_delta_log(spark, t, [("id", "=", 91)])
    delta_log.update_delta_log(
        spark, t, [("id", ">=", 90)], {"v": "v + 1000"}
    )
    got = {x.id: x.v for x in delta_log.read_delta(spark, t).collect()}
    assert 91 not in got and got[95] == 1951 and len(got) == 99

    # no-match UPDATE: a commit with zero file actions
    r3 = delta_log.update_delta_log(
        spark, t, [("id", ">", 10_000)], {"v": "0"}
    )
    assert r3["updated_rows"] == 0 and r3["files_rewritten"] == 0

    with pytest.raises(ValueError):
        delta_log.update_delta_log(spark, t, [], {"v": "0"})
    with pytest.raises(ValueError):
        delta_log.update_delta_log(
            spark, t, [("id", "=", 1)], {"nope": "0"}
        )


def test_update_recomputes_generated_and_enforces_checks(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "updgen")
    base = spark.range(10).select(
        "id",
        (F.col("id") * 10).alias("v"),
        (F.col("id") * 10 % 7).cast("long").alias(
            "v_mod", metadata={"delta.generationExpression": "v % 7"}
        ),
    )
    delta_log.write_delta(spark, base, t)
    delta_log.add_check_constraint(spark, t, "v_cap", "v < 1000")

    delta_log.update_delta_log(
        spark, t, [("id", "=", 3)], {"v": "v + 5"}
    )
    row = (
        delta_log.read_delta(spark, t)
        .filter(F.col("id") == 3)
        .collect()[0]
    )
    assert row.v == 35 and row.v_mod == 35 % 7  # generated recomputed

    # an update that would break the CHECK is refused atomically
    with pytest.raises(delta_log.DeltaInvariantViolationError):
        delta_log.update_delta_log(
            spark, t, [("id", "=", 3)], {"v": "v + 100000"}
        )
    assert (
        delta_log.read_delta(spark, t)
        .filter(F.col("id") == 3)
        .collect()[0]
        .v
        == 35
    )


def test_stream_merge_clauses_cdc_routing(spark, tmp_path):
    """One streaming sink routes a CDC feed's upserts AND deletes via
    the general MERGE clause list — no stream pre-splitting."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.streaming.sink import (
        stream_merge_clauses,
    )

    t = str(tmp_path / "cdc_t")
    src = str(tmp_path / "cdc_src")
    delta_log.write_delta(
        spark, spark.range(5).withColumn("v", F.col("id") * 10), t
    )
    feed = spark.createDataFrame(
        [(1, 111, "u"), (3, 0, "d"), (9, 90, "u")],
        "id long, nv long, op string",
    )
    feed.coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema(feed.schema).parquet(src)
    stream_merge_clauses(
        sdf,
        spark,
        t,
        ["id"],
        [
            {"when": "matched", "action": "delete",
             "condition": "s.op = 'd'"},
            {"when": "matched", "action": "update",
             "condition": "s.op = 'u'", "set": {"v": "s.nv"}},
            {"when": "not_matched", "action": "insert",
             "condition": "s.op = 'u'",
             "values": {"id": "s.id", "v": "s.nv"}},
        ],
    )
    got = {r.id: r.v for r in delta_log.read_delta(spark, t).collect()}
    assert got == {0: 0, 1: 111, 2: 20, 4: 40, 9: 90}


def test_table_detail_and_auto_checkpoint_and_dry_run(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "detail")
    delta_log.write_delta(
        spark,
        spark.range(30).withColumn("v", F.col("id")).repartition(3),
        t,
        partition_by=[],
    )
    delta_log.delete_delta_log(spark, t, [("id", "=", 5)])
    d = delta_log.table_detail(t)
    assert d["numRows"] == 29  # DV cardinality subtracted
    assert d["numFiles"] >= 3 and d["sizeInBytes"] > 0
    assert d["numDeletionVectors"] == 1
    assert d["version"] == 1 and d["partitionColumns"] == []

    # auto-checkpoint: not due at interval 10, due at 2
    assert delta_log.maybe_checkpoint(t, interval=10) is None
    assert delta_log.maybe_checkpoint(t, interval=2) == 1
    assert delta_log.maybe_checkpoint(t, interval=2) is None  # fresh

    # vacuum dry-run: lists but does not delete
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(99, 1)], "id long, v long"),
        t,
        mode="overwrite",
    )
    would = delta_log.vacuum(t, keep_versions=1, dry_run=True)
    assert would
    still = delta_log.read_delta(spark, t, version_as_of=1)
    assert still.count() == 29  # old version untouched by dry run
    deleted = delta_log.vacuum(t, keep_versions=1)
    assert sorted(deleted) == sorted(would)


def test_repair_table_drops_dangling_references(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "fsck")
    delta_log.write_delta(
        spark,
        spark.range(40).withColumn("v", F.col("id")).repartition(4),
        t,
    )
    # simulate an out-of-band deletion of one data file
    snap = delta_log.resolve_snapshot(t)
    victim = sorted(snap["files"])[0]
    os.remove(os.path.join(t, victim))

    with pytest.raises(Exception):
        delta_log.read_delta(spark, t).count()  # broken table

    rep0 = delta_log.repair_table(t, dry_run=True)
    assert rep0["dangling"] == [victim] and rep0["version"] is None
    rep = delta_log.repair_table(t)
    assert rep["dangling"] == [victim]
    out = delta_log.read_delta(spark, t)
    assert 0 < out.count() < 40  # readable again, loss bounded
    # clean table: repair is a no-op
    assert delta_log.repair_table(t)["dangling"] == []
