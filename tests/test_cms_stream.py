"""Streaming Count-Min heavy hitters (stateful.cms_topk_monitor):
cross-microbatch counter state equals the batch sketch, final top-k
estimates equal batch cms_query, true heavy hitters surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import sketches as sk
from medallion_delta_lake_spark.streaming import events as se
from medallion_delta_lake_spark.streaming import stateful

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def test_stream_topk_equals_batch_cms(spark, tmp_path):
    # zipf-ish per type: item i appears (40 − i) times, i ∈ [0, 40)
    rows = [
        ("click", f"u{i}", j)
        for i in range(40)
        for j in range(40 - i)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, item string, j int"
    ).select("event_type", "item", "j")
    src = str(tmp_path / "cms_src")
    # two microbatches split by the repeat index — every item with
    # count > 20 spans BOTH batches, so counters must merge
    df.filter(F.col("j") < 20).coalesce(1).write.parquet(src)
    df.filter(F.col("j") >= 20).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = se.run_available_now(
        stateful.cms_topk_monitor(sdf, d=4, w=256, k=5),
        "update",
        spark,
    )
    # update mode re-emits per batch: keep the LAST emission per item
    final = {}
    for r in out.collect():
        final[r.item] = r.est_cnt
    # the last microbatch's top-5; compare against the batch sketch
    batch_sketch = sk.cms_partials(
        df.filter(F.col("event_type") == "click"), [], "item",
        d=4, w=256,
    )
    probes = spark.createDataFrame(
        [(f"u{i}",) for i in range(40)], "item string"
    )
    batch_est = {
        r["probe"]: r["est_cnt"]
        for r in sk.cms_query(
            batch_sketch, probes, "item", d=4, w=256
        ).collect()
    }
    # the true top-5 (u0..u4, counts 40..36) must be present with
    # exactly the batch sketch's estimates
    for i in range(5):
        it = f"u{i}"
        assert it in final, f"heavy hitter {it} missing from top-k"
        assert final[it] == batch_est[it]
        assert final[it] >= 40 - i  # never under-counts


def test_stream_topk_multiple_groups(spark, tmp_path):
    rows = [("a", "x", 0)] * 5 + [("a", "y", 0)] * 2 + [
        ("b", "z", 0)
    ] * 3
    df = spark.createDataFrame(
        rows, "event_type string, item string, j int"
    )
    src = str(tmp_path / "grp_src")
    df.coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema(df.schema).parquet(src)
    out = se.run_available_now(
        stateful.cms_topk_monitor(sdf, d=4, w=64, k=2), "update", spark
    )
    got = {
        (r.event_type, r.item): r.est_cnt for r in out.collect()
    }
    assert got[("a", "x")] >= 5
    assert got[("b", "z")] >= 3
    assert ("a", "y") in got  # k=2 keeps both 'a' items
