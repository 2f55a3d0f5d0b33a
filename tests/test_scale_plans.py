"""Plan-shape assertions for the scale features: bucketed co-located
joins (no shuffle), partition pruning on the batch-lineage column, and
broadcast/pushdown in the headline join trees. These check the PLANS —
the properties that decide 100 TB behavior — not just row values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans import queries_core  # noqa: F401
from medallion_delta_lake_spark.plans import queries_tpch  # noqa: F401
from medallion_delta_lake_spark.plans.registry import QUERIES, table
from tests.conftest import SF_SMOKE


def _final_plan(df) -> str:
    """Execute (AQE finalizes the physical plan at runtime) and return
    the final plan string."""
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the exchange:
    the sort-merge join reads co-located buckets directly. (This is the
    'co-locate big-big joins' lever; at 100 TB it converts the largest
    shuffle into a map-side merge.)"""
    warehouse_db = "mdls_bucket_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {warehouse_db}")
    try:
        orders = table(spark, SF_SMOKE, "orders")
        li = table(spark, SF_SMOKE, "lineitem")
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable(f"{warehouse_db}.orders_b")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable(f"{warehouse_db}.lineitem_b")

        ob = spark.table(f"{warehouse_db}.orders_b")
        lb = spark.table(f"{warehouse_db}.lineitem_b")
        # force SMJ so the bucket layout (not a broadcast) is what
        # eliminates the exchange
        joined = ob.hint("merge").join(
            lb, ob["o_orderkey"] == lb["l_orderkey"]
        ).select("o_orderkey", "l_linenumber", "l_quantity")
        plan = _final_plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        plain = orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        assert joined.count() == plain.count()
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {warehouse_db} CASCADE")


def test_partition_pruning_on_batch_column(spark, tmp_path):
    """A filter on the hive-partition column must prune at planning
    time: the pruned read touches only that partition's files."""
    path = str(tmp_path / "events_part")
    ev = table(spark, SF_SMOKE, "events").withColumn(
        "day", F.dayofmonth("ts")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)

    pruned = spark.read.parquet(path).filter(F.col("day") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan_line = next(
        line for line in plan.splitlines() if "FileScan" in line
    )
    # the day predicate must appear as a PARTITION filter on the scan
    # (planning-time file-index pruning), not as a post-scan Filter
    assert "PartitionFilters: [isnotnull(day" in scan_line, scan_line
    assert "(day" in scan_line.split("PartitionFilters")[1].split("]")[0]
    n_days = ev.select("day").distinct().count()
    assert n_days > 1
    assert pruned.count() == ev.filter(F.col("day") == 1).count()


@pytest.mark.parametrize(
    "name,must_have",
    [
        ("q3-shipping-priority", ["BroadcastHashJoin", "TakeOrderedAndProject"]),
        ("q1-pricing-summary", ["HashAggregate", "PushedFilters: [IsNotNull(l_shipdate)"]),
        ("join-left-using", ["BroadcastHashJoin"]),
        ("sort-limit-topn", ["TakeOrderedAndProject"]),
    ],
)
def test_headline_plan_shapes(spark, name, must_have):
    plan = _final_plan(QUERIES[name](spark, SF_SMOKE))
    for frag in must_have:
        assert frag in plan, f"{name}: missing {frag}\n{plan[:2000]}"


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, tmp_path):
    """Spark's InjectRuntimeFilter (on by default in this session) adds
    a bloom `might_contain` pre-filter to the FACT side of a shuffle
    join whose dim side carries a selective filter — the runtime join-
    prune lever at 100 TB. Locally the 10 GB application-side threshold
    never trips, so the test lowers it to prove the mechanism engages
    (and that results are unchanged: bloom false-positives are removed
    by the join itself)."""
    from pyspark.sql import functions as F

    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(fact_p)
    spark.range(200_000).select(
        F.col("id").alias("k"), F.pmod(F.col("id"), F.lit(1000)).alias("tag")
    ).write.parquet(dim_p)

    confs = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {}
    for c in confs:
        try:
            old[c] = spark.conf.get(c)
        except Exception:
            old[c] = None  # unset by default
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        f = spark.read.parquet(fact_p)
        d = spark.read.parquet(dim_p).filter(F.col("tag") == 7)
        j = f.join(d, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan  # bloom injected on the fact side
        assert j.count() == 200  # identical result, FPs joined away
    finally:
        for c, v in old.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold"
        )


def test_headline_plan_contracts(spark):
    """Optimizer-regression guard over the audited headline queries:
    no cartesian products anywhere, and every TPC-H analog keeps at
    least one broadcast join (a lost broadcast is the classic silent
    100TB regression — a dimension spilling into a shuffle join)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    tpch = [n for n in qs if n.startswith("q") and n[1].isdigit()]
    for name in tpch:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert (
            "BroadcastHashJoin" in plan
            or "BroadcastNestedLoopJoin" in plan
            or "Join" not in plan  # scan-agg shapes (q1, q6)
        ), name


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast: the (100 TB) training
    side probes it without shuffling text, and the only exchanges are
    the per-doc bigint-keyed rollups."""
    from medallion_delta_lake_spark.plans.queries_text import (
        text_decontaminate_q,
    )

    df = text_decontaminate_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_block_dedup_shuffles_hashes_not_text(spark):
    """The chunk-frequency aggregate must have a partial (map-side)
    phase, and no exchange may carry the text column — blocks travel
    as 8-byte hashes."""
    from medallion_delta_lake_spark.plans.queries_text import (
        dedup_paragraph_blocks_q,
    )

    df = dedup_paragraph_blocks_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "partial_count" in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_mixture_budget_scans_corpus_once(spark):
    """The global minimum is a window over the tiny per-stratum frame,
    NOT a scalar rejoin that would re-derive the totals subtree — the
    (100 TB) corpus is scanned exactly once."""
    from medallion_delta_lake_spark.plans.queries_text import (
        mixture_token_budget_q,
    )

    df = mixture_token_budget_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_shuffle_shards_single_narrow_exchange(spark):
    """The epoch-shuffle permutation is decided by the 8-byte ticket:
    exactly one hash exchange (the per-shard window), and no exchange
    carries the text column — at 100 TB only (id, ticket) pairs move."""
    from medallion_delta_lake_spark.plans.queries_text import (
        corpus_shuffle_shards_q,
    )

    df = corpus_shuffle_shards_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_split_assignment_is_zero_shuffle(spark):
    """Split assignment must stay a per-row codegen predicate: the
    only exchange in the audit query is the final tiny groupBy, and
    the aggregate has a partial (map-side) phase."""
    from medallion_delta_lake_spark.plans.queries_text import (
        split_train_holdout_q,
    )

    df = split_train_holdout_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_count" in plan, plan


def test_ngram_freq_wordcount_shape(spark):
    """The gram count must pre-aggregate map-side (the explode output
    never shuffles raw) and read only the text column from the scan."""
    from medallion_delta_lake_spark.plans.queries_text import (
        text_ngram_freq_q,
    )

    df = text_ngram_freq_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "partial_count" in plan, plan
    assert "ReadSchema: struct<text:string>" in plan, plan


def test_leakage_audit_no_cartesian_no_text_shuffle(spark):
    """The leakage audit reuses the banded-LSH candidate plan: no
    cartesian product, and no exchange carries document text."""
    from medallion_delta_lake_spark.plans.queries_text import (
        split_leakage_audit_q,
    )

    df = split_leakage_audit_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_interval_overlap_join_no_nested_loop(spark):
    """The interval-overlap join must plan as a bucket equi-join — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere (the naive
    inequality-join spelling Spark would otherwise choose dies at
    scale)."""
    from medallion_delta_lake_spark.plans.queries_rel import (
        join_interval_overlap_q,
    )

    df = join_interval_overlap_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    ), plan


def test_pagerank_caches_edge_derivation(spark):
    """Each PageRank iteration must re-join the CACHED edge table, not
    replay the 4-way base-table join lineage (InMemoryTableScan shows
    up; base tables are scanned a bounded number of times)."""
    from medallion_delta_lake_spark.plans.queries_rel import (
        graph_pagerank_nations_q,
    )

    df = graph_pagerank_nations_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "InMemoryTableScan" in plan, plan


def test_rfm_no_global_per_user_sort(spark):
    """events-rfm-scores (VERDICT r10 fix): quintiles must come from
    the sort-free global-rank machinery — the ONLY single-partition
    exchanges may feed windows over DISTINCT-VALUE frames (days /
    counts / distinct monetary values), never the per-user frame, and
    the per-tie ROW_NUMBERs must be partitioned (distributed)."""
    from medallion_delta_lake_spark.plans.queries_feature import (
        events_rfm_scores_q,
    )

    df = events_rfm_scores_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "ntile" not in plan.lower(), plan
    # VERDICT r11: the monetary axis is CONTINUOUS (per-user double
    # sums are near-unique), so its offsets frame must be grouped on
    # the bounded bucket key, never on the raw monetary value — a
    # 'keys=[monetary' HashAggregate would make the offsets frame
    # user-cardinality (O(users) single-partition window + broadcast)
    assert "keys=[monetary" not in plan, plan
    assert "_bkt_rm" in plan, plan
    # every window over the per-user frame must be PARTITIONED —
    # no 'Window [...], [user-frame-order]' without partition spec;
    # physical check: each Window node's child exchange must be a
    # hashpartitioning, except windows fed by SinglePartition which
    # must sit on a grouped (distinct-value) frame, visible as a
    # preceding HashAggregate
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            tail = "\n".join(lines[i : i + 6])
            assert "HashAggregate" in tail, (
                "SinglePartition exchange not feeding off a grouped "
                f"(distinct-value) frame:\n{tail}"
            )


def test_seasonal_anomaly_takeordered(spark):
    """events-seasonal-anomaly (VERDICT r10 fix): the top-20 must be
    TakeOrdered (distributed local top-k), not a row_number over an
    unpartitioned window."""
    from medallion_delta_lake_spark.plans.queries_feature import (
        events_seasonal_anomaly_q,
    )

    df = events_seasonal_anomaly_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "row_number" not in plan, plan


def test_basket_pairs_capped_and_takeordered(spark):
    """affinity-basket-pairs (VERDICT r10 fix): top-20 via TakeOrdered,
    the basket-size cap enforced, and the cap never silent — the audit
    sees a synthetic oversized basket that basket_pairs drops."""
    from medallion_delta_lake_spark.operators.graph import (
        basket_cap_audit,
        basket_pairs,
    )
    from medallion_delta_lake_spark.plans.queries_feature import (
        affinity_basket_pairs_q,
    )

    df = affinity_basket_pairs_q(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "row_number" not in plan, plan

    # synthetic: one 5-item mega-basket above a cap of 4, two small
    # baskets below it — the mega-basket must vanish from the pairs
    # and show up in the audit
    rows = [(1, i) for i in range(5)] + [(2, 1), (2, 2), (3, 1), (3, 2)]
    items = spark.createDataFrame(rows, "o bigint, p bigint")
    pairs = basket_pairs(
        items, "o", "p", max_basket_size=4, min_pair_count=1, top_k=10
    ).collect()
    assert {(r.p1, r.p2) for r in pairs} == {(1, 2)}
    n_pair = next(r.n_pair for r in pairs)
    assert n_pair == 2  # baskets 2 and 3 only — basket 1 dropped
    audit = basket_cap_audit(items, "o", "p", max_basket_size=4).collect()[0]
    assert audit.n_baskets == 3
    assert audit.n_dropped == 1
    assert audit.max_dropped_size == 5


@pytest.mark.parametrize("n", [1, 2, 4, 5, 6, 23, 100, 101])
def test_ntile_formula_matches_native_ntile(spark, n):
    """The exact-integer NTILE(5) formula events-rfm-scores uses
    (queries_feature._ntile_from_rank) must equal Spark's native
    ntile for every N shape — remainder-to-front, N < k, N % k = 0."""
    from pyspark.sql import Window as W

    from medallion_delta_lake_spark.plans.queries_feature import (
        _ntile_from_rank,
    )

    df = spark.range(1, n + 1).select(
        F.col("id").alias("r"), F.lit(n).cast("bigint").alias("big_n")
    )
    native = df.select(
        "r",
        F.ntile(5).over(W.orderBy("r")).alias("want"),
    )
    got = df.select("r", _ntile_from_rank("r", "big_n", 5).alias("got"))
    j = native.join(got, "r")
    assert j.filter(F.col("want") != F.col("got")).count() == 0


def test_bucketed_rank_user_cardinality_axis(spark):
    """mleval.bucketed_global_rank (VERDICT r11 fix): on an axis whose
    values are ALL DISTINCT (user-cardinality — the monetary-sum
    shape), (a) the rank must equal a native global row_number, with
    prefix sums exact; (b) the broadcast-side offsets frame must be
    grouped on the bounded bucket key, never the raw axis; (c) the
    bucket key itself is bounded by construction even for extreme
    doubles."""
    from medallion_delta_lake_spark.operators.mleval import (
        axis_bucket,
        bucketed_global_rank,
    )
    from pyspark.sql import Window as W

    n = 5000
    # near-unique continuous axis: a hash-spread double per id
    base = spark.range(n).select(
        F.col("id").alias("uid"),
        (
            (F.xxhash64(F.col("id")) % 1000000).cast("double") / 7.0
        ).alias("v"),
        (F.col("id") % 3 == 0).cast("int").alias("y"),
    )
    assert base.select("v").distinct().count() > n * 0.99

    got = bucketed_global_rank(
        base, "v", False, "r", "uid", prefix_sums={"cum_y": "y"}
    )
    want = base.select(
        "uid",
        F.row_number()
        .over(W.orderBy(F.col("v").desc(), F.col("uid").asc()))
        .alias("r_want"),
        F.sum("y")
        .over(
            W.orderBy(F.col("v").desc(), F.col("uid").asc()).rowsBetween(
                W.unboundedPreceding, 0
            )
        )
        .alias("cum_y_want"),
    )
    j = got.join(want, "uid")
    assert j.filter(
        (F.col("r") != F.col("r_want"))
        | (F.col("cum_y") != F.col("cum_y_want"))
    ).count() == 0

    plan = _final_plan(got)
    # the only broadcast must ship the bucket-keyed offsets frame —
    # no HashAggregate keyed on the raw axis anywhere in the plan
    assert "keys=[v#" not in plan, plan
    assert "_bkt_r" in plan, plan
    assert "BroadcastExchange" in plan, plan

    # bucket-key boundedness: the most extreme FINITE doubles stay
    # inside ±1024·8 (±inf maps to the int64 extremes — two bounded
    # sentinel values, still order-preserving)
    xs = [1.7976931348623157e308, -1.7976931348623157e308, 0.0,
          1e-300, -1e-300, 12.34]
    ext = spark.createDataFrame(
        [(x,) for x in xs], "x double"
    ).select(axis_bucket(F.col("x")).alias("b"))
    vals = [r.b for r in ext.collect()]
    assert all(abs(b) <= 1024 * 8 for b in vals), vals
    # order preservation across the sample
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    bs = dict(zip(xs, vals))
    assert all(
        bs[xs[order[i]]] <= bs[xs[order[i + 1]]]
        for i in range(len(order) - 1)
    )


@pytest.mark.parametrize(
    "modname,fname,bucket_keys",
    [
        ("queries_rel", "agg_gini_coefficient_q", ["_bkt_i"]),
        ("queries_rel", "agg_pareto_abc_q", ["_bkt__i"]),
        ("queries_feature", "normalize_quantile_map_q", ["_bkt_pr", "_bkt_r"]),
        ("queries_feature", "join_nn_match_1d_q", ["_bkt"]),
        ("queries_feature", "stats_matched_uplift_q", ["_bkt"]),
    ],
)
def test_bucketed_rewrites_plan_shape(spark, modname, fname, bucket_keys):
    """r12 global-window sweep pins: every face rewritten off a
    row-cardinality unpartitioned window must (a) carry the bounded
    bucket key in its plan, (b) never group an offsets frame on the
    raw continuous axis, and (c) only use SinglePartition exchanges
    that feed grouped (HashAggregate) frames — the same contract the
    events-rfm-scores test enforces."""
    import importlib

    mod = importlib.import_module(
        f"medallion_delta_lake_spark.plans.{modname}"
    )
    df = getattr(mod, fname)(spark, SF_SMOKE)
    plan = _final_plan(df)
    for k in bucket_keys:
        assert k in plan, f"{fname}: bucket key {k} missing\n{plan[:1500]}"
    # no offsets frame grouped on the raw axis these faces rank by
    for raw in ("keys=[spend#", "keys=[monetary#", "keys=[value#", "keys=[v#"):
        assert raw not in plan, f"{fname}: raw-axis aggregate {raw}"
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            tail = "\n".join(lines[i : i + 6])
            # grouped frames plan as HashAggregate, or SortAggregate
            # when the agg has ordering-sensitive functions (max_by)
            assert "HashAggregate" in tail or "SortAggregate" in tail, (
                f"{fname}: SinglePartition exchange not feeding a "
                f"grouped frame:\n{tail}"
            )


def test_topk_faces_use_takeordered(spark):
    """text-zipf-profile / explode-token-freq (r12 fix): the top-k cut
    must plan TakeOrderedAndProject BEFORE the rank window — never a
    vocab-cardinality row_number in one partition."""
    from medallion_delta_lake_spark.plans.queries_rel import (
        explode_token_freq_q,
    )
    from medallion_delta_lake_spark.plans.queries_text import (
        text_zipf_profile_q,
    )

    for fn in (explode_token_freq_q, text_zipf_profile_q):
        plan = _final_plan(fn(spark, SF_SMOKE))
        assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_sketch_maintenance_commit_scoped(spark, tmp_path):
    """The sketch-maintenance E2Es' cost is driven by commit count /
    touched files, not table rows (BASELINE r12's flat-at-10× claim,
    made structural per VERDICT r12 #6): a churn commit confined to
    one file's key range must remove/re-add ONLY that file — the
    untouched file's add action never re-enters the log."""
    import json
    import os

    from medallion_delta_lake_spark.sources import delta_log as dl

    p = str(tmp_path / "t")
    lo = spark.range(0, 500).select(
        "id", F.col("id").cast("string").alias("item")
    )
    hi = spark.range(500, 1000).select(
        "id", F.col("id").cast("string").alias("item")
    )
    dl.write_delta(spark, lo.coalesce(1), p, mode="overwrite")
    dl.write_delta(spark, hi.coalesce(1), p, mode="append")
    files_v1 = set(dl.resolve_snapshot(p)["files"])
    assert len(files_v1) == 2
    lo_file = next(
        f
        for f, add in dl.resolve_snapshot(p)["files"].items()
        if json.loads(add.get("stats", "{}")).get("minValues", {}).get(
            "id", 10**9
        )
        < 500
    )
    dl.delete_delta_log(spark, p, [("id", "<", 100)])
    log = os.path.join(p, "_delta_log")
    with open(os.path.join(log, f"{2:020d}.json")) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    touched = {
        a["remove"]["path"] for a in actions if a.get("remove")
    } | {a["add"]["path"] for a in actions if a.get("add")}
    assert touched == {lo_file}, (
        f"delete commit must be file-scoped to {lo_file}: {touched}"
    )
    dl.update_delta_log(
        spark, p, [("id", "<", 200)], {"item": "concat(item, '_x')"}
    )
    with open(os.path.join(log, f"{3:020d}.json")) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    touched = {
        a["remove"]["path"] for a in actions if a.get("remove")
    } | {
        a["add"]["path"]
        for a in actions
        if a.get("add")
        and not a["add"]["path"].startswith("_change_data/")
    }
    # the update rewrites the lo file (new data file replaces it);
    # the hi file must not appear in any action
    hi_file = next(iter(files_v1 - {lo_file}))
    assert lo_file in touched and hi_file not in touched, touched


def test_epoch_rebuild_rescans_only_touched_epochs(spark):
    """sketch_epoch_rebuild's plan: kept partials anti-join and the
    rescan semi-joins a BROADCAST touched-epoch set, and the rebuild
    aggregation sits ABOVE the semi join — untouched epochs are
    neither re-scanned nor re-aggregated. This is the 100 TB posture
    behind sketch-hll-rebuild's flat 10× row (the touched set is
    days, not rows)."""
    from medallion_delta_lake_spark.operators import sketches as sk

    current = spark.range(0, 10000).select(
        (F.col("id") % 10).alias("epoch"),
        F.col("id").alias("uid"),
    )
    partials = sk.hll_partials(current, ["epoch"], "uid", p=8)
    changes = spark.range(3, 4).select(F.col("id").alias("epoch"))
    out = sk.sketch_epoch_rebuild(
        current,
        partials,
        changes,
        "epoch",
        lambda df: sk.hll_partials(df, ["epoch"], "uid", p=8),
    )
    plan = _final_plan(out)
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan
    # the semi join (rescan filter) must sit BELOW the aggregation:
    # a plan that aggregates the full table and joins after would
    # re-aggregate every epoch
    agg_pos = plan.find("HashAggregate")
    semi_pos = plan.find("LeftSemi")
    assert 0 <= agg_pos < semi_pos, plan
