"""10× scaling measurement for the round-9 ML-evaluation additions
(plans/queries_mleval.py). Protocol matches prior rounds: the sf0.1
base table unions 10 key-offset copies (key cardinality scales too),
each op runs at 1× and 10× on local[32]; the 10× row is the signal
(the 1× row pays plan compile + warmup). Drives the REAL registered
query functions by substituting the module's table() binding.

    python tools/scale10_r9b.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"

OPS = [
    "ml-roc-auc",
    "ml-lift-deciles",
    "ml-pr-at-k",
    "ml-brier-score",
    "ml-confusion-threshold",
    "ml-ndcg-at-k",
    "ml-group-auc",
    "ml-ks-separation",
    "ts-holt-linear",
    "agg-bootstrap-poisson-ci",
    "events-conversion-lag",
    "stats-anova-oneway",
    "agg-seasonal-index",
    "window-rolling-median",
    "events-dau-wau-mau",
    "affinity-basket-pairs",
    "stats-permutation-test",
    "events-seasonal-anomaly",
    "window-rsi",
    "agg-hdr-percentiles",
    "stats-cohens-kappa",
    "ml-expected-calibration-error",
    "stats-friedman-test",
    "agg-tukey-fences",
    "join-nn-match-1d",
    "stats-matched-uplift",
    "stats-durbin-watson",
    "events-new-vs-returning",
    "window-donchian-channel",
    "stats-sign-test",
    "stats-two-proportion-z",
    "stats-cuped-theta",
    "stats-srm-check",
    "stats-ols-slope-group",
    "agg-xyz-classification",
]

ID_COLS = {
    "events": ["event_id", "user_id"],
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
    import medallion_delta_lake_spark.plans.queries_mleval as qm
    from medallion_delta_lake_spark.plans.registry import QUERIES
    from medallion_delta_lake_spark.session import get_spark

    spark = get_spark(app_name="scale10-r9b")
    spark.sparkContext.setLogLevel("ERROR")

    orig_table = qm.table

    def table10(sp, sf_dir, name):
        df = orig_table(sp, sf_dir, name)
        if name in ID_COLS:
            return x10(df, ID_COLS[name])
        return df

    for tag, tbl in (("1x", orig_table), ("10x", table10)):
        qm.table = tbl
        qf.table = tbl
        for op in OPS:
            t0 = time.time()
            n = QUERIES[op](spark, SF).count()
            print(f"{op} {tag}: {time.time() - t0:.2f} s ({n} rows)")
    qm.table = orig_table
    qf.table = orig_table
    spark.stop()


if __name__ == "__main__":
    main()
