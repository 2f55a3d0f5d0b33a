"""Delta identity columns (sources/identity.py): allocation,
restart monotonicity, GENERATED ALWAYS vs BY DEFAULT, the
concurrent-append re-allocation race, and SYNC IDENTITY."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from medallion_delta_lake_spark.sources import identity as idm
from medallion_delta_lake_spark.sources.delta_log import (
    DeltaConcurrentWriteError,
    DeltaSchemaMismatchError,
    read_delta,
    resolve_snapshot,
)

SCHEMA = StructType(
    [StructField("name", StringType()), StructField("v", LongType())]
)


def _hwm(path: str) -> int | None:
    meta = resolve_snapshot(path)["meta"]
    return idm.identity_columns(meta)["id"]["high_water_mark"]


def test_create_then_append_allocates_start_step(spark, tmp_path):
    p = str(tmp_path / "t")
    assert (
        idm.create_identity_table(
            spark, p, SCHEMA, "id", start=10, step=5
        )
        == 0
    )
    proto = resolve_snapshot(p)["protocol"]
    assert proto["minWriterVersion"] == 6  # legacy identityColumns
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], SCHEMA
    ).repartition(2)
    assert idm.append_with_identity(spark, df, p) == 1
    ids = sorted(r["id"] for r in read_delta(spark, p).collect())
    assert ids == [10, 15, 20]  # start, start+step, ...
    assert _hwm(p) == 20


def test_restart_monotonicity_across_snapshots(spark, tmp_path):
    """A fresh writer process (modeled by re-resolving from disk)
    continues past the committed high-water mark."""
    p = str(tmp_path / "t")
    idm.create_identity_table(spark, p, SCHEMA, "id")
    idm.append_with_identity(
        spark, spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA), p
    )
    idm.append_with_identity(
        spark, spark.createDataFrame([("c", 3)], SCHEMA), p
    )
    ids = sorted(r["id"] for r in read_delta(spark, p).collect())
    assert ids == [1, 2, 3]
    assert _hwm(p) == 3


def test_generated_always_rejects_explicit_values(spark, tmp_path):
    p = str(tmp_path / "t")
    idm.create_identity_table(spark, p, SCHEMA, "id")
    df = spark.createDataFrame([("a", 1)], SCHEMA).withColumn(
        "id", F.lit(99).cast("long")
    )
    with pytest.raises(DeltaSchemaMismatchError, match="ALWAYS"):
        idm.append_with_identity(spark, df, p)


def test_by_default_keeps_explicit_and_never_collides(spark, tmp_path):
    p = str(tmp_path / "t")
    idm.create_identity_table(
        spark, p, SCHEMA, "id", allow_explicit=True
    )
    # explicit insert at 100 advances the mark to 100
    idm.append_with_identity(
        spark,
        spark.createDataFrame(
            [(100, "x", 1)], "id long, name string, v long"
        ),
        p,
    )
    assert _hwm(p) == 100
    # generation resumes past it
    idm.append_with_identity(
        spark, spark.createDataFrame([("y", 2)], SCHEMA), p
    )
    ids = sorted(r["id"] for r in read_delta(spark, p).collect())
    assert ids == [100, 101]


def test_negative_step_descends(spark, tmp_path):
    p = str(tmp_path / "t")
    idm.create_identity_table(
        spark, p, SCHEMA, "id", start=0, step=-2
    )
    idm.append_with_identity(
        spark, spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA), p
    )
    ids = sorted(r["id"] for r in read_delta(spark, p).collect())
    assert ids == [-2, 0]
    assert _hwm(p) == -2


def test_concurrent_append_race_reallocates(spark, tmp_path, monkeypatch):
    """The loser of a commit race must RE-ALLOCATE against the
    winner's high-water mark — ids stay globally unique. The race is
    injected by letting a second writer land a full identity append
    between the loser's snapshot read and its commit attempt."""
    p = str(tmp_path / "t")
    idm.create_identity_table(spark, p, SCHEMA, "id")
    idm.append_with_identity(
        spark, spark.createDataFrame([("seed", 0)], SCHEMA), p
    )
    real_commit = idm._commit_version
    fired = {"done": False}

    def racing_commit(path, build, read_version=None):
        if not fired["done"]:
            fired["done"] = True
            # the winner: a real identity append via the unpatched path
            monkeypatch.setattr(idm, "_commit_version", real_commit)
            idm.append_with_identity(
                spark,
                spark.createDataFrame([("winner", 1)], SCHEMA),
                p,
            )
            monkeypatch.setattr(idm, "_commit_version", racing_commit)
        return real_commit(path, build, read_version=read_version)

    monkeypatch.setattr(idm, "_commit_version", racing_commit)
    idm.append_with_identity(
        spark,
        spark.createDataFrame([("loser-a", 2), ("loser-b", 3)], SCHEMA),
        p,
    )
    monkeypatch.setattr(idm, "_commit_version", real_commit)
    rows = read_delta(spark, p).collect()
    ids = sorted(r["id"] for r in rows)
    assert ids == [1, 2, 3, 4]  # unique, dense, no duplicates
    assert _hwm(p) == 4
    by_name = {r["name"]: r["id"] for r in rows}
    assert by_name["seed"] == 1 and by_name["winner"] == 2


def test_sync_identity_recomputes_from_data(spark, tmp_path):
    p = str(tmp_path / "t")
    idm.create_identity_table(
        spark, p, SCHEMA, "id", allow_explicit=True
    )
    idm.append_with_identity(
        spark,
        spark.createDataFrame(
            [(7, "x", 1), (3, "y", 2)], "id long, name string, v long"
        ),
        p,
    )
    v = idm.sync_identity(spark, p)
    assert v == 2
    assert _hwm(p) == 7
    # and generation continues from the synced mark
    idm.append_with_identity(
        spark, spark.createDataFrame([("z", 3)], SCHEMA), p
    )
    assert sorted(
        r["id"] for r in read_delta(spark, p).collect()
    ) == [3, 7, 8]


def test_create_rejects_collision_and_zero_step(spark, tmp_path):
    with pytest.raises(ValueError, match="collides"):
        idm.create_identity_table(
            spark, str(tmp_path / "a"), SCHEMA, "name"
        )
    with pytest.raises(ValueError, match="non-zero"):
        idm.create_identity_table(
            spark, str(tmp_path / "b"), SCHEMA, "id", step=0
        )
    p = str(tmp_path / "c")
    idm.create_identity_table(spark, p, SCHEMA, "id")
    with pytest.raises(DeltaConcurrentWriteError, match="exists"):
        idm.create_identity_table(spark, p, SCHEMA, "id")


def test_plain_write_delta_append_refuses_identity_table(
    spark, tmp_path
):
    """The footgun guard: a plain write_delta append to an identity
    table would ship caller values without advancing the mark."""
    from medallion_delta_lake_spark.sources.delta_log import write_delta

    p = str(tmp_path / "t")
    idm.create_identity_table(spark, p, SCHEMA, "id")
    idm.append_with_identity(
        spark, spark.createDataFrame([("a", 1)], SCHEMA), p
    )
    bad = spark.createDataFrame(
        [(99, "b", 2)], "id long, name string, v long"
    )
    with pytest.raises(
        DeltaSchemaMismatchError, match="append_with_identity"
    ):
        write_delta(spark, bad, p)
