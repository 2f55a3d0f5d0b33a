"""Croston intermittent-demand smoothing: batch hand-recursion,
zero-run semantics, and the streaming twin's cross-microbatch state
(pre-built in r10; the registered query face lands in r11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators.pandas_ops import croston
from medallion_delta_lake_spark.streaming import events as se
from medallion_delta_lake_spark.streaming import stateful


def test_croston_hand_recursion(spark):
    """Series 0, 4, 0, 0, 6, 2 with α = ½ (q counts the steps since
    the previous demand, first demand initializes z = x, p = q):
      step 1 (x=4, q=2): z=4,   p=2          → rate 2.0
      step 4 (x=6, q=3): z=5,   p=2.5        → rate 2.0
      step 5 (x=2, q=1): z=3.5, p=1.75       → rate 2.0
    """
    rows = [(1, i, float(x)) for i, x in enumerate([0, 4, 0, 0, 6, 2])]
    df = spark.createDataFrame(rows, "g long, step long, x double")
    got = {
        r["step"]: (r["z"], r["p"], r["demand_rate"])
        for r in croston(df, "g", "step", "x").collect()
    }
    assert got[0] == (None, None, None)  # before the first demand
    assert got[1] == (4.0, 2.0, 2.0)
    assert got[2] == (4.0, 2.0, 2.0)  # zero step: state holds
    assert got[4] == (5.0, 2.5, 2.0)
    assert got[5] == (3.5, 1.75, 2.0)


def test_croston_all_zero_series_emits_nulls(spark):
    df = spark.createDataFrame(
        [(1, i, 0.0) for i in range(4)], "g long, step long, x double"
    )
    out = croston(df, "g", "step", "x").collect()
    assert len(out) == 4
    assert all(r["demand_rate"] is None for r in out)


def test_stream_croston_multi_microbatch_equals_batch(spark, tmp_path):
    """Feeding a per-user-ordered intermittent series as two
    time-split files (one per microbatch) ends in exactly the batch
    recursion's final state — q (steps since last demand) must
    survive the batch boundary."""
    series = [0, 4, 0, 0, 6, 0, 2, 0]
    rows = [
        (u, i, float(v)) for u in (1, 2) for i, v in enumerate(series)
    ]
    df = (
        spark.createDataFrame(rows, "user_id long, n int, value double")
        .select(
            "user_id",
            (
                F.to_timestamp(F.lit("2024-01-01"))
                + F.make_interval(secs=F.col("n") * 60)
            ).alias("ts"),
            F.col("n").cast("long").alias("event_id"),
            "value",
        )
    )
    src = str(tmp_path / "croston_src")
    # split mid-zero-run so q spans the boundary
    df.filter(F.col("event_id") < 3).coalesce(1).write.parquet(src)
    df.filter(F.col("event_id") >= 3).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = se.run_available_now(
        stateful.croston_monitor(sdf), "update", spark
    )
    final = {}
    for r in out.collect():  # update mode re-emits: keep last per key
        final[r.user_id] = (r.n_obs, r.z, r.p, r.demand_rate)

    b = croston(
        df.select(
            "user_id",
            F.col("event_id").alias("step"),
            F.col("value").alias("x"),
        ),
        "user_id",
        "step",
        "x",
    )
    last = {
        r.user_id: (r.z, r.p, r.demand_rate)
        for r in b.filter(F.col("step") == len(series) - 1).collect()
    }
    assert set(final) == {1, 2}
    for u in final:
        assert final[u][0] == len(series)
        assert (final[u][1], final[u][2], final[u][3]) == last[u]
