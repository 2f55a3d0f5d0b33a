"""Streaming KMV distinct-count (stateful.kmv_distinct_monitor):
final state across microbatch splits equals the batch sketch
bit-for-bit (the bottom-k merge law), exact below k, estimate above.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import sketches as sk
from medallion_delta_lake_spark.streaming import events as se
from medallion_delta_lake_spark.streaming import stateful


def _run(spark, tmp_path, rows, k, name):
    df = spark.createDataFrame(
        rows, "event_type string, item string, j int"
    )
    src = str(tmp_path / name)
    df.filter(F.col("j") % 2 == 0).coalesce(1).write.parquet(src)
    df.filter(F.col("j") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = se.run_available_now(
        stateful.kmv_distinct_monitor(sdf, k=k), "update", spark
    )
    final = {}
    for r in out.collect():  # update mode: keep last per key
        final[r.event_type] = (r.n_kept, r.h_k, r.est_q6)
    return df, final


def test_stream_kmv_equals_batch_sketch(spark, tmp_path):
    # 500 distinct items per type, interleaved across two batches
    rows = [
        (t, f"{t}_u{i}", i)
        for t in ("click", "view")
        for i in range(500)
    ]
    k = 64
    df, final = _run(spark, tmp_path, rows, k, "kmv_src")
    parts = sk.kmv_partials(df, ["event_type"], "item", k=k)
    batch = {
        r["event_type"]: (r["n_kept"], r["h_k"], r["est_q6"])
        for r in sk.kmv_estimate(parts, ["event_type"], k=k).collect()
    }
    assert final == batch  # bit-for-bit, not approximately
    for t in ("click", "view"):
        assert abs(final[t][2] / 1e6 - 500) / 500 < 0.40  # k=64, 3σ


def test_stream_kmv_exact_below_k(spark, tmp_path):
    rows = [("a", f"u{i % 30}", i) for i in range(90)]  # 30 distinct
    _, final = _run(spark, tmp_path, rows, 64, "kmv_small")
    assert final["a"][0] == 30
    assert final["a"][2] == 30 * 10**6  # exact, duplicates ignored
