"""Operator laws behind the r15 draft faces (pre-built this round):

- graph.label_propagation — fixed-round min-label propagation:
  monotone (labels never increase), self-inclusive (a node keeps its
  own label when isolated), and equal to exact connected-component
  minima once the round count reaches the graph diameter;
- sketches.kmv_diff_ops — the A-not-B estimator's partition law
  (d_ab + d_ba + |X∩A∩B| = |X|) and exactness below k;
- the bitmap exact-distinct identity the agg-bitmap-exact-distinct
  face rides: chunked bitmap_construct_agg/bitmap_count equals
  COUNT(DISTINCT) for any id distribution, including duplicates and
  chunk-boundary ids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import sketches as sk
from medallion_delta_lake_spark.operators.graph import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def test_label_propagation_reaches_cc_minima(spark):
    # two components: a path 1-2-3-4 (diameter 3) and a pair 10-11
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        r["id"]: r["lbl"]
        for r in label_propagation(e, iters=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_label_propagation_partial_after_one_round(spark):
    # one round moves labels one hop: node 4 only sees 3's own label
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        r["id"]: r["lbl"]
        for r in label_propagation(e, iters=1).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 3}


def test_label_propagation_duplicate_and_bidirectional_edges(spark):
    # (a,b) given in both directions plus duplicates — MIN is blind
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    got = {
        r["id"]: r["lbl"]
        for r in label_propagation(e, iters=2).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_kmv_diff_partition_law_and_exactness(spark):
    # A = id0..id499, B = id300..id799 → |A\B| = 300, |B\A| = 300,
    # |A∩B| = 200, |A∪B| = 800 — all below k=1024, so every estimate
    # is exact and the X partition must be a true partition.
    rows = [("a", f"id{i:04d}") for i in range(500)] + [
        ("b", f"id{i:04d}") for i in range(300, 800)
    ]
    df = spark.createDataFrame(rows, "src string, v string")
    parts = sk.kmv_partials(df, ["src"], "v", k=1024)
    a = parts.filter(F.col("src") == "a").select("h")
    b = parts.filter(F.col("src") == "b").select("h")
    out = sk.kmv_diff_ops(a, b, k=1024).collect()[0]
    assert out["x_n"] == 800
    assert out["d_ab"] == 300
    assert out["d_ba"] == 300
    assert out["union_est_q6"] == 800 * 10**6
    assert out["diff_ab_est_q6"] == 300 * 10**6
    assert out["diff_ba_est_q6"] == 300 * 10**6
    # partition law: only-A + only-B + both = |X|
    assert out["d_ab"] + out["d_ba"] + 200 == out["x_n"]


def test_kmv_diff_estimator_above_k(spark):
    # 20k vs 20k ids with 10k overlap, k=256. The A-not-B estimator
    # stacks binomial sampling noise (d/x_n over 256 slots, σ≈6%) on
    # the union estimate (σ≈1/√(k−2)≈6.3%) — 4σ ≈ 25% bound keeps
    # the law deterministic for this fixed id set (measured 17%).
    rows = [("a", f"k{i}") for i in range(20000)] + [
        ("b", f"k{i}") for i in range(10000, 30000)
    ]
    df = spark.createDataFrame(rows, "src string, v string")
    parts = sk.kmv_partials(df, ["src"], "v", k=256)
    a = parts.filter(F.col("src") == "a").select("h")
    b = parts.filter(F.col("src") == "b").select("h")
    out = sk.kmv_diff_ops(a, b, k=256).collect()[0]
    assert abs(out["diff_ab_est_q6"] / 1e6 - 10000) < 2500
    assert abs(out["diff_ba_est_q6"] / 1e6 - 10000) < 2500


def test_bitmap_chunked_distinct_equals_exact(spark):
    # ids straddle chunk boundaries (32768) and repeat heavily
    ids = (
        list(range(1, 100))
        + list(range(32760, 32780))  # straddles bucket 0/1 boundary
        + list(range(100000, 100050))
        + [1, 1, 32768, 32769, 100000]  # duplicates
    )
    df = spark.createDataFrame([(i,) for i in ids], "mid bigint")
    chunks = (
        df.select(
            F.floor((F.col("mid") - 1) / F.lit(32768))
            .cast("bigint")
            .alias("bucket"),
            F.bitmap_bit_position(F.col("mid")).alias("pos"),
        )
        .groupBy("bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    got = chunks.agg(
        F.sum(F.bitmap_count("bm")).alias("n")
    ).collect()[0]["n"]
    assert got == len(set(ids))


def test_label_propagation_lineage_is_linear(spark):
    # the naive least(own, min-neighbour) update references the label
    # frame twice per round — the unresolved plan DOUBLES each
    # iteration (2^k recompute; measured 42s -> 11s at sf0.1 when
    # fixed). The self-loop form must grow by a CONSTANT number of
    # joins per extra round.
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])

    def n_joins(iters: int) -> int:
        plan = (
            label_propagation(e, iters=iters)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        return plan.count("Join")

    j2, j3, j4 = n_joins(2), n_joins(3), n_joins(4)
    assert j3 - j2 == j4 - j3, "join count must grow linearly"
    assert j4 - j3 <= 2, f"per-round join growth too high: {j4 - j3}"
