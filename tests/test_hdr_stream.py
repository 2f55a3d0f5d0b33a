"""Streaming HDR quantiles (stateful.hdr_quantile_monitor): bin
state across microbatch splits equals the batch sketch (sum-merge
law), so emitted quantiles match the batch operator bit-for-bit."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import sketches as sk
from medallion_delta_lake_spark.streaming import events as se
from medallion_delta_lake_spark.streaming import stateful


def test_stream_hdr_equals_batch(spark, tmp_path):
    rng = random.Random(11)
    rows = [
        (t, int(rng.lognormvariate(7, 1.5)) + 1, j)
        for t in ("click", "view")
        for j in range(4000)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, v long, j int"
    )
    src = str(tmp_path / "hdr_src")
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
        stateful.hdr_quantile_monitor(sdf, sub_bits=5), "update", spark
    )
    final = {}
    for r in out.collect():  # update mode: keep last per key
        final[(r.event_type, r.q_permille)] = r.est
    parts = sk.hdr_partials(df, ["event_type"], "v", sub_bits=5)
    batch = {
        (r["event_type"], r["q_permille"]): r["est"]
        for r in sk.hdr_quantiles(
            parts, ["event_type"], qs=(0.5, 0.9, 0.99)
        ).collect()
    }
    # streaming final emission == batch operator, bit for bit
    assert final == batch
    # and the estimates are sane lower bounds of real quantiles
    import math

    for t in ("click", "view"):
        sv = sorted(v for tt, v, _ in rows if tt == t)
        for qp in (500, 900, 990):
            exact = sv[math.ceil(len(sv) * qp / 1000) - 1]
            assert final[(t, qp)] <= exact
            assert (exact - final[(t, qp)]) / exact < 0.0625 + 1e-9
