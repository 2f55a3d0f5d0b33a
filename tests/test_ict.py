"""In-commit timestamps (Delta ICT table feature): monotonic commit
clock in commitInfo, spec-shaped enablement (provenance properties +
writer-feature adoption), ICT-preferring timestamp time travel that
survives mtime skew."""

from __future__ import annotations

import json
import os
import time

from medallion_delta_lake_spark.sources import delta_log as dl


def _commits(path):
    log = os.path.join(path, "_delta_log")
    out = {}
    for f in sorted(os.listdir(log)):
        if f.endswith(".json"):
            with open(os.path.join(log, f)) as fh:
                out[int(f.split(".")[0])] = [
                    json.loads(ln) for ln in fh if ln.strip()
                ]
    return out


def _mk(spark, tmp_path, rows):
    p = str(tmp_path / "t")
    dl.write_delta(
        spark, spark.createDataFrame(rows, "id long, v string"), p
    )
    return p


def test_ict_disabled_by_default(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, "a")])
    dl.write_delta(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        p,
        mode="append",
    )
    for acts in _commits(p).values():
        for a in acts:
            if a.get("commitInfo"):
                assert "inCommitTimestamp" not in a["commitInfo"]


def test_ict_enablement_commit_shape(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, "a")])
    v = dl.set_table_properties(
        p, {"delta.enableInCommitTimestamps": "true"}
    )
    acts = _commits(p)[v]
    # commitInfo first, carrying the ICT
    assert "commitInfo" in acts[0]
    ict = acts[0]["commitInfo"]["inCommitTimestamp"]
    assert isinstance(ict, int) and ict > 0
    # enablement provenance on the metaData
    meta = next(a["metaData"] for a in acts if a.get("metaData"))
    conf = meta["configuration"]
    assert conf["delta.inCommitTimestampEnablementVersion"] == str(v)
    assert conf["delta.inCommitTimestampEnablementTimestamp"] == str(ict)
    # writer-feature adoption with legacy features preserved
    proto = next(a["protocol"] for a in acts if a.get("protocol"))
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])


def test_ict_monotonic_chain_and_clock_skew(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, "a")])
    dl.set_table_properties(p, {"delta.enableInCommitTimestamps": "true"})
    v2 = dl.write_delta(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        p,
        mode="append",
    )
    commits = _commits(p)
    icts = {
        v: next(
            a["commitInfo"]["inCommitTimestamp"]
            for a in acts
            if a.get("commitInfo")
        )
        for v, acts in commits.items()
        if v >= 1
    }
    assert icts[v2] > icts[1]
    # clock skew: doctor the last commit's ICT far into the future;
    # the next commit must still advance (prev + 1), never regress
    log = os.path.join(p, "_delta_log")
    future = int(time.time() * 1000) + 10**9
    f = os.path.join(log, f"{v2:020d}.json")
    with open(f) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    for a in acts:
        if a.get("commitInfo"):
            a["commitInfo"]["inCommitTimestamp"] = future
    with open(f, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    v3 = dl.write_delta(
        spark,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        p,
        mode="append",
    )
    icts3 = next(
        a["commitInfo"]["inCommitTimestamp"]
        for a in _commits(p)[v3]
        if a.get("commitInfo")
    )
    assert icts3 == future + 1


def test_ict_timestamp_travel_survives_mtime_skew(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, "a")])
    dl.set_table_properties(p, {"delta.enableInCommitTimestamps": "true"})
    dl.write_delta(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        p,
        mode="append",
    )
    v3 = dl.write_delta(
        spark,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        p,
        mode="append",
    )
    commits = _commits(p)
    ict_v2 = next(
        a["commitInfo"]["inCommitTimestamp"]
        for a in commits[v3 - 1]
        if a.get("commitInfo")
    )
    # wreck every mtime (simulating a log copy): all files same old time
    log = os.path.join(p, "_delta_log")
    old = time.time() - 10**6
    for f in os.listdir(log):
        os.utime(os.path.join(log, f), (old, old))
    # ICT still resolves: at v2's commit instant we must see v2
    assert dl.version_at_timestamp(p, ict_v2 / 1000.0) == v3 - 1
    got = dl.read_delta(spark, p, timestamp_as_of=ict_v2 / 1000.0)
    assert sorted(r["id"] for r in got.collect()) == [1, 2]


def test_ict_rows_roundtrip_and_history(spark, tmp_path):
    p = _mk(spark, tmp_path, [(1, "a")])
    dl.set_table_properties(p, {"delta.enableInCommitTimestamps": "true"})
    dl.write_delta(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        p,
        mode="append",
    )
    got = dl.read_delta(spark, p)
    assert sorted(r["id"] for r in got.collect()) == [1, 2]


def test_ict_survives_external_commit_without_commitinfo_key(
    spark, tmp_path
):
    """Enablement is a table PROPERTY (metaData configuration), not a
    property of the previous commit's commitInfo: an intervening
    commit written by an external/older writer whose commitInfo lacks
    ``inCommitTimestamp`` must not silently disable ICT for later
    commits (ADVICE r8)."""
    p = _mk(spark, tmp_path, [(1, "a")])
    dl.set_table_properties(
        p, {"delta.enableInCommitTimestamps": "true"}
    )
    # simulate an external writer: a bare add-only commit whose
    # commitInfo has no inCommitTimestamp key
    snap = dl.resolve_snapshot(p)
    v_ext = snap["version"] + 1
    log = os.path.join(p, "_delta_log")
    with open(os.path.join(log, f"{v_ext:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "WRITE"}}) + "\n")
    # a following engine commit must still carry a monotonic ICT
    dl.write_delta(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        p,
        mode="append",
    )
    commits = _commits(p)
    v_last = max(commits)
    assert v_last > v_ext
    ci = next(
        a["commitInfo"]
        for a in commits[v_last]
        if a.get("commitInfo") is not None
    )
    assert "inCommitTimestamp" in ci
    # monotonic vs the last ICT-bearing commit before the gap
    prev_icts = [
        a["commitInfo"]["inCommitTimestamp"]
        for v, acts in commits.items()
        if v < v_ext
        for a in acts
        if a.get("commitInfo") and "inCommitTimestamp" in a["commitInfo"]
    ]
    assert ci["inCommitTimestamp"] > max(prev_icts)
