"""Measured payoff of the skew levers on a deliberately 100×-skewed key.

    python tools/bench_skew.py

Builds a fact table where one key holds 100× the average key's rows,
then times:
  1. plain groupBy sum/count   vs salted_sum_count
  2. plain shuffle join        vs salted_join
     (broadcast disabled — the 100 TB scenario where the dimension
      doesn't fit; AQE skew-join split additionally measured on/off)

Results are recorded in BASELINE.md ("Skewed-join lever"). Run twice
internally; the better run is reported (codegen warm-up discounted).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from medallion_delta_lake_spark.operators import skew  # noqa: E402
from medallion_delta_lake_spark.session import get_spark  # noqa: E402

N_ROWS = 16_000_000
N_KEYS = 100  # non-hot keys ≈ 80k rows each; hot key 0 ≈ 8M (100×)
HOT_FRAC = 0.5


def build(spark):
    base = spark.range(N_ROWS).select(
        F.when(
            F.rand(seed=7) < HOT_FRAC, F.lit(0)
        ).otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS))).alias("k"),
        (F.rand(seed=11) * 100).alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_payload")
    )
    return base.localCheckpoint(), dim.localCheckpoint()


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark)

    # --- aggregation: map-side combine already absorbs sum/count skew
    t_plain_agg = timed(
        lambda: fact.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("t"),
            F.count(F.lit(1)).alias("n"),
        )
        ._jdf.collectToPython()  # noqa: SLF001 - count() would prune v
    )
    t_salted_agg = timed(
        lambda: skew.salted_sum_count(fact, ["k"], "v")._jdf.collectToPython()
    )

    # --- join: disable broadcast (dimension "too big" scenario)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )

    def run_join(df):
        return df.groupBy().agg(F.sum("dim_payload")).collect()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_plain_join = timed(lambda: run_join(fact.join(dim, "k")))
    t_salted_join = timed(
        lambda: run_join(skew.salted_join(fact, dim, ["k"], salt_buckets=32))
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_aqe_join = timed(lambda: run_join(fact.join(dim, "k")))

    print(f"rows={N_ROWS} keys={N_KEYS} hot_frac={HOT_FRAC}")
    print(f"agg   plain={t_plain_agg:.2f}s salted={t_salted_agg:.2f}s")
    print(
        f"join  plain(no-AQE-skew)={t_plain_join:.2f}s "
        f"salted={t_salted_join:.2f}s aqe-skew-split={t_aqe_join:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
