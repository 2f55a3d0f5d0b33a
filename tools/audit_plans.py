"""Generate PLANS.md: a physical-plan audit of headline queries.

For each audited query: join strategies chosen, exchange (shuffle)
count, scan pushdown (PushedFilters / PartitionFilters / ReadSchema
width), and whole-stage-codegen coverage — the properties that decide
behavior at 100 TB. Run after operator changes:

    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

AUDITED = [
    # round-13 registrations (r13 + r14 cohorts)
    "maintenance-optimize-zorder",
    "maintenance-restore-version",
    "join-cdf-maintained",
    "agg-cdf-incremental-refresh",
    "sketch-hll-churn-epoch",
    "scan-delta-skipping",
    "scan-parquet-partition-prune",
    "stats-wilcoxon-signed-rank",
    "text-hapax-ratio",
    "dedup-lsh-recall-audit",
    "maintenance-vacuum-retention",
    "maintenance-checkpoint-v2",
    "cluster-kmeans-refine",
    "dedup-semantic-bucketed",
    "events-retention-triangle",
    "stats-cochran-q",
    "window-kaufman-er",
    "agg-trimmed-mean",
    "ml-fbeta-sweep",
    "stats-cohens-d",
    # earlier rounds
    "scan-csv-typed",
    "scan-json-lines",
    "scan-orc-roundtrip",
    "sink-delta-append-evolve",
    "sink-delta-overwrite-timetravel",
    "sketch-hll-rebuild",
    "sketch-cms-maintained",
    "ml-average-precision",
    "ml-matthews-corr",
    "sample-weighted-bernoulli",
    "variant-key-census",
    "variant-type-profile",
    "events-survival-table",
    "events-cohort-ltv-curve",
    "agg-pareto-abc",
    "stats-matched-uplift",
    "explode-token-freq",
    "q1-pricing-summary",
    "q3-shipping-priority",
    "q5-local-supplier",
    "q10-returned-items",
    "q16-supplier-cnt",
    "q17-small-quantity-revenue",
    "q21-suppliers-waiting",
    "q22-global-sales-opportunity",
    "join-left-using",
    "join-asof-nearest",
    "join-salted-skew",
    "nn-assign",
    "dedup-minhash-lsh",
    "sim-ann-lsh",
    "window-agg-tumbling",
    "topk-per-group",
    "sort-limit-topn",
    "text-decontaminate",
    "dedup-paragraph-blocks",
    "mixture-token-budget",
    "text-token-typicality",
    "corpus-shuffle-shards",
    "split-train-holdout",
    "vector-quantize-pq",
    "sim-pq-adc-topk",
    "stats-gini-impurity",
    "ts-resample-ffill",
    "window-anomaly-zscore",
    "graph-pagerank-nations",
    "join-interval-overlap",
    "sample-importance-weighted",
    "cluster-balance-stats",
    "agg-mode-exact",
    "dedup-url-canonical",
    "text-html-strip",
    "multimodal-dhash-bands",
    "window-ewma-smooth",
    "agg-weighted-median",
    "stats-ks-two-sample",
    "sample-temperature-mixture",
    "stats-chi-square",
    "agg-percentile-bands",
    "text-vocab-overlap",
    "join-asof-forward",
    "window-streaks",
    "multimodal-dhash-pairs",
    "window-max-drawdown",
    "stats-spearman-rho",
    "stats-welch-t",
    "window-cusum-drift",
    "sample-mixture-epochs",
    "join-asof-tolerance",
    "stats-autocorr-lag1",
    "multimodal-frame-dedup",
    "stream-cusum-monitor",
    "graph-triangle-count",
    "approx-hll-mergeable",
    "merge-clause-state",
    "agg-gini-coefficient",
    "stats-benford-deviation",
    "ts-seasonal-naive",
    "window-winsorize",
    "scd2-history-build",
    # round-8 additions
    "scd2-incremental-upsert",
    "dedup-cc-bigstar",
    "stats-theil-sen",
    "stats-kendall-tau",
    "window-rolling-slope",
    "window-regime-segments",
    "sketch-count-min",
    "text-zipf-profile",
    "sim-ann-ivf",
    "multimodal-scene-cuts",
    "stats-mad-outliers",
    "graph-degree-histogram",
    "stats-runs-test",
    "join-bloom-prefilter",
    "agg-latency-histogram",
    "window-bollinger-bands",
    "text-ngram-novelty",
    "stats-brown-forsythe",
    "sample-quality-audit",
    "agg-markov-transition",
    "join-fuzzy-blocked",
    "udtf-chunk-windows",
    "pandas-udaf-median",
    # round-8 late additions (drift family + friends)
    "drift-total-variation",
    "drift-hellinger-cat",
    "stats-kruskal-wallis",
    "stats-jarque-bera",
    "multimodal-aspect-buckets",
    "window-rolling-autocorr",
    "graph-jaccard-suppliers",
    "agg-corr-matrix",
    "events-attribution-lasttouch",
    "stream-drift-monitor",
    # round-8 snapshot-commit ops (never audited in r8)
    "events-sankey-paths",
    "window-time-weighted-avg",
    "stats-wilson-ci",
    # round-9 additions
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
    # round-9 ML-evaluation family
    "ml-roc-auc",
    "ml-lift-deciles",
    "ml-group-auc",
    "ml-ndcg-at-k",
    "ts-holt-linear",
    "agg-bootstrap-poisson-ci",
    "events-conversion-lag",
    "stats-anova-oneway",
    "sim-centroid-outliers",
    "events-dau-wau-mau",
    "affinity-basket-pairs",
    "stats-permutation-test",
    "window-rolling-median",
    "events-seasonal-anomaly",
    "text-top-terms",
    "window-rsi",
    "agg-hdr-percentiles",
    "stats-cohens-kappa",
    "ml-expected-calibration-error",
    # round-9 late additions (missed by the r9 audit — judge item #4)
    "join-nn-match-1d",
    "stats-srm-check",
    "stats-ols-slope-group",
    "agg-xyz-classification",
    # round-10 additions
    "scan-delta-identity",
    "stream-merge-clauses",
    "sample-bottomk-quantiles",
    "stats-hodges-lehmann",
    # round-11 additions (the 14 registered r10 drafts)
    "sketch-hll-users",
    "sketch-kmv-distinct",
    "sketch-kmv-overlap",
    "sketch-cms-probe",
    "sketch-bloom-semijoin",
    "sketch-hdr-quantiles",
    "text-bm25-core",
    "variant-shred-orders",
    "sim-jl-components",
    "ts-croston-rate",
    "stream-cms-topk",
    "stream-kmv-distinct",
    "stream-croston-monitor",
    "ml-target-encode-oof",
]


def summarize(plan: str) -> dict:
    # cached (InMemoryRelation) subtrees re-print their full build plan
    # at EVERY reference — dedup lines (ids normalized away) before any
    # operator counting, so a thrice-referenced cache doesn't triple
    # every metric under it
    uniq, useen = [], set()
    for line in plan.splitlines():
        key = re.sub(r"#\d+L?", "#", line.lstrip(" :+-*("))
        if key in useen:
            continue
        useen.add(key)
        uniq.append(line)
    plan = "\n".join(uniq)
    scans, seen = [], set()
    for line in plan.splitlines():
        if "FileScan" in line:
            # normalize away per-print attribute ids (#123L) and tree
            # prefixes: each re-print of a cached build plan mints fresh
            # ids, which would defeat the dedup
            key = re.sub(r"#\d+L?", "#", line[line.index("FileScan"):])
            if key in seen:
                continue
            seen.add(key)
            pushed = re.search(r"PushedFilters: \[([^\]]*)\]", line)
            schema = re.search(r"ReadSchema: struct<(.*?)(?:>|$)", line)
            ncols = len(schema.group(1).split(",")) if schema else None
            scans.append(
                {
                    "pushed": pushed.group(1)[:80] if pushed else "",
                    "n_cols": ncols,
                }
            )
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        # dedup by the full node line (plan_id included): a cached
        # subtree (InMemoryRelation) re-prints its build plan, which
        # would double-count its exchanges
        "exchanges": len(
            {
                ln.strip()
                for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln
            }
        ),
        "codegen_spans": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "cached_scans": plan.count("InMemoryTableScan"),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "scans": scans,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from medallion_delta_lake_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = e.queries()

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `tools/audit_plans.py` over `{sf_dir}` (final "
        "AQE plans, post-execution). Columns: join strategies, shuffle "
        "exchanges, whole-stage-codegen spans, per-scan pushdown and "
        "projected width.",
        "",
        "| query | broadcast | sort-merge | shuffles | codegen spans | cache reads | top-N | distinct scans (pushed filters → projected cols) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in AUDITED:
        df = queries[name](spark, sf_dir)
        df.count()
        s = summarize(df._jdf.queryExecution().executedPlan().toString())
        scan_txt = "; ".join(
            f"[{sc['pushed'] or 'none'}] → {sc['n_cols']} cols"
            for sc in s["scans"]
        )
        lines.append(
            f"| `{name}` | {s['broadcast_joins']} | {s['sortmerge_joins']} "
            f"| {s['exchanges']} | {s['codegen_spans']} | {s['cached_scans']} "
            f"| {'yes' if s['take_ordered'] else '—'} | {scan_txt} |"
        )
    lines += [
        "",
        "Reading guide: a dimension join shows as broadcast (no shuffle "
        "of the fact side); `sort-limit` top-N shows TakeOrderedAndProject "
        "(per-partition top-N + driver merge, no global sort); scans show "
        "their pushed predicates and pruned column counts. Higher-order-"
        "function stages (MinHash, cosine) run outside codegen by design — "
        "their parallelism comes from partitioning (`fan_out`), not "
        "codegen. `join-asof-nearest`'s exchanges are all NARROW "
        "(distinct (key, ts) probe points, the union window, the right "
        "pre-aggregation); the resolved payload reattaches to the wide "
        "left side via the broadcast join in its row — the wide fact "
        "never shuffles. `join-salted-skew` shows zero exchanges because "
        "the replicated dimension broadcasts at this SF; at scale the "
        "salt spreads the hot key across reducers (BASELINE.md).",
    ]
    Path("PLANS.md").write_text("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(AUDITED)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
