"""Column DEFAULT values (allowColumnDefaults table feature):
SET/DROP DEFAULT, writer-side fill of absent columns, the constant-
foldable restriction, and the protocol upgrade."""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.sources import delta_log


def _mk(spark, tmp_path):
    p = str(tmp_path / "t")
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k int, s string, v int"
        ).coalesce(1),
        p,
    )
    return p


def test_set_default_fills_absent_column(spark, tmp_path):
    p = _mk(spark, tmp_path)
    delta_log.set_column_default(spark, p, "v", "42")
    # writer omits v → default fills it; schema validation passes
    delta_log.write_delta(
        spark,
        spark.createDataFrame([(3, "c")], "k int, s string").coalesce(1),
        p,
    )
    rows = {
        (r["k"], r["v"])
        for r in delta_log.read_delta(spark, p).collect()
    }
    assert rows == {(1, 10), (2, 20), (3, 42)}


def test_supplied_values_beat_the_default(spark, tmp_path):
    p = _mk(spark, tmp_path)
    delta_log.set_column_default(spark, p, "v", "42")
    delta_log.write_delta(
        spark,
        spark.createDataFrame(
            [(4, "d", 99)], "k int, s string, v int"
        ).coalesce(1),
        p,
    )
    assert {
        r["v"]
        for r in delta_log.read_delta(spark, p)
        .filter("k = 4")
        .collect()
    } == {99}


def test_protocol_upgrades_to_v7_with_feature(spark, tmp_path):
    p = _mk(spark, tmp_path)
    delta_log.set_column_default(spark, p, "v", "42")
    proto = delta_log.resolve_snapshot(p)["protocol"]
    assert proto["minWriterVersion"] == 7
    wf = set(proto["writerFeatures"])
    assert "allowColumnDefaults" in wf
    # legacy implied features preserved by the upgrade
    assert {"appendOnly", "invariants"} <= wf
    # idempotent-ish: a second SET DEFAULT commits no new protocol
    delta_log.set_column_default(spark, p, "s", "'zz'")
    assert (
        delta_log.resolve_snapshot(p)["protocol"]["writerFeatures"]
        == proto["writerFeatures"]
    )


def test_non_constant_default_rejected(spark, tmp_path):
    p = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="constant-foldable"):
        delta_log.set_column_default(spark, p, "v", "k + 1")


def test_drop_default_restores_strict_schema(spark, tmp_path):
    p = _mk(spark, tmp_path)
    delta_log.set_column_default(spark, p, "v", "42")
    delta_log.drop_column_default(p, "v")
    with pytest.raises(delta_log.DeltaSchemaMismatchError):
        delta_log.write_delta(
            spark,
            spark.createDataFrame(
                [(5, "e")], "k int, s string"
            ).coalesce(1),
            p,
        )
    with pytest.raises(KeyError):
        delta_log.drop_column_default(p, "v")


def test_guards(spark, tmp_path):
    p = _mk(spark, tmp_path)
    with pytest.raises(KeyError):
        delta_log.set_column_default(spark, p, "nope", "1")
