"""10× scaling measurement for the round-9 additions
(plans/queries_feature.py). Protocol matches prior rounds: the sf0.1
base table unions 10 key-offset copies (so key cardinality scales
too), each op runs at 1× and 10× on local[32], and the signal is the
10× row (the 1× row pays plan compile + warmup). Unlike earlier
rounds this drives the REAL registered query functions by
substituting the registry's table() with a 10×-returning wrapper.

    python tools/scale10_r9.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"

OPS = [
    "feature-point-in-time",
    "window-mann-kendall",
    "stats-cramers-v",
    "events-rfm-scores",
    "stats-grubbs-test",
    "sample-weighted-reservoir",
    "window-cusum-mean-shift",
    "agg-l-moments",
    "normalize-quantile-map",
    "ml-calibration-bins",
]

ID_COLS = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
}


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


def main() -> None:
    import medallion_delta_lake_spark.plans.queries_feature as qf
    from medallion_delta_lake_spark.plans.registry import QUERIES
    from medallion_delta_lake_spark.session import get_spark

    spark = get_spark(app_name="scale10-r9")
    spark.sparkContext.setLogLevel("ERROR")

    orig_table = qf.table

    def table10(sp, sf_dir, name):
        df = orig_table(sp, sf_dir, name)
        if name in ID_COLS:
            return x10(df, ID_COLS[name])
        return df

    for tag, tbl in (("1x", orig_table), ("10x", table10)):
        qf.table = tbl
        for op in OPS:
            t0 = time.time()
            n = QUERIES[op](spark, SF).count()
            print(f"{op} {tag}: {time.time() - t0:.2f} s ({n} rows)")
    qf.table = orig_table
    spark.stop()


if __name__ == "__main__":
    main()
