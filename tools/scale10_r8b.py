"""10× scaling measurement for the round-8 late additions (drift
family + friends). Protocol matches prior rounds: the sf0.1 base table
unions 10 shifted copies (ids offset so key cardinality scales too),
the op runs at 1× and 10× on local[32], and the signal is the 10× row
(the 1× row pays plan compile + warmup).

    python tools/scale10_r8b.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"


def x10(df, id_cols):
    parts = []
    for i in range(10):
        d = df
        for c in id_cols:
            d = d.withColumn(c, F.col(c) + F.lit(i * 10_000_000))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(name, build):
    t0 = time.time()
    df = build()
    n = df.count()
    print(f"{name}: {time.time() - t0:.2f} s ({n} rows)")


def main() -> None:
    from medallion_delta_lake_spark.operators import (
        agg,
        drift,
        graph,
        multimodal as mm,
        window as win,
    )
    from medallion_delta_lake_spark.plans.registry import table
    from medallion_delta_lake_spark.session import get_spark

    spark = get_spark(app_name="scale10-r8b")
    spark.sparkContext.setLogLevel("ERROR")

    ev1 = table(spark, SF, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    ev10 = x10(ev1, ["event_id", "user_id"])
    li1 = table(spark, SF, "lineitem")
    or1 = table(spark, SF, "orders")

    def ev_cases(ev, tag):
        timed(
            f"drift-total-variation {tag}",
            lambda: drift.binned_total_variation(
                ev.select(
                    "value",
                    (F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
                    .alias("cur"),
                ),
                "value",
                "cur",
            ),
        )
        timed(
            f"drift-hellinger-cat {tag}",
            lambda: drift.categorical_bhattacharyya(
                ev.select(
                    "event_type",
                    (F.weekday("ts") >= F.lit(5)).alias("wk"),
                ),
                "event_type",
                "wk",
            ),
        )
        timed(
            f"stats-kruskal-wallis {tag}",
            lambda: agg.kruskal_wallis(ev, "value", "event_type"),
        )
        timed(
            f"stats-jarque-bera {tag}",
            lambda: agg.jarque_bera(ev, "value", "event_type"),
        )
        timed(
            f"window-rolling-autocorr {tag}",
            lambda: win.rolling_autocorr(
                ev, ["user_id"], ["ts", "event_id"], "value"
            ),
        )

        def attribution():
            from pyspark.sql import Window as W

            w = (
                W.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(W.unboundedPreceding, -1)
            )
            touch = F.when(
                F.col("event_type") != "purchase", F.col("event_type")
            )
            tts = F.when(
                F.col("event_type") != "purchase", F.col("ts")
            )
            o = ev.select(
                "event_type",
                "ts",
                "value",
                F.last(touch, ignorenulls=True).over(w).alias("tt"),
                F.last(tts, ignorenulls=True).over(w).alias("tsx"),
            )
            p = o.filter(F.col("event_type") == "purchase").select(
                F.when(
                    F.col("tsx").isNotNull()
                    & (F.col("tsx") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
                    F.col("tt"),
                )
                .otherwise(F.lit("direct"))
                .alias("channel"),
                "value",
            )
            return p.groupBy("channel").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(38,6)"))
                .cast("double")
                .alias("v"),
            )

        timed(f"events-attribution-lasttouch {tag}", attribution)

    def li_cases(li, orders, tag):
        timed(
            f"agg-corr-matrix {tag}",
            lambda: agg.corr_matrix(
                li.select(
                    "l_quantity", "l_extendedprice", "l_discount", "l_tax"
                ),
                ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            ),
        )

        def jac():
            edges = (
                li.filter(F.col("l_quantity") >= 45)
                .select("l_suppkey", "l_orderkey")
                .join(
                    orders.select("o_orderkey", "o_custkey"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .select(
                    F.col("l_suppkey").alias("supp"),
                    F.col("o_custkey").alias("cust"),
                )
            )
            return graph.jaccard_neighbors(
                edges, "supp", "cust", max_degree=50, min_common=2
            )

        timed(f"graph-jaccard-suppliers {tag}", jac)

    def aspect(n, tag):
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (128 + (F.col("id") * 37) % 1920).cast("bigint").alias("width"),
            (128 + (F.col("id") * 73) % 1080).cast("bigint").alias("height"),
        )
        timed(
            f"multimodal-aspect-buckets {tag}",
            lambda: mm.aspect_bucket_batches(
                mm.aspect_bucket_assign(docs)
            ),
        )

    ev_cases(ev1, "1x")
    ev_cases(ev10, "10x")
    li10 = x10(li1, ["l_orderkey"])
    or10 = x10(or1, ["o_orderkey", "o_custkey"])
    li_cases(li1, or1, "1x")
    li_cases(li10, or10, "10x")
    aspect(50_000, "1x(50k)")
    aspect(500_000, "10x(500k)")
    spark.stop()


if __name__ == "__main__":
    main()
