"""Edge cases for the round-6 operators that the oracle sweep's
single registered query per op does not reach: interval-overlap join
duplicate suppression across many shared buckets + left semantics,
forward-fill across multi-bucket gaps, z-score trailing-window
warm-up, Gini bounds, PageRank mass conservation on a closed graph,
and the weight-sampling rate contract."""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import agg, joins, sampling
from medallion_delta_lake_spark.operators.graph import pagerank
from medallion_delta_lake_spark.operators.window import (
    resample_ffill,
    rolling_zscore,
)


def test_interval_overlap_counts_multi_bucket_pairs_once(spark):
    # left interval spans 10 buckets; right overlaps it in 9 of them —
    # the first-shared-bucket predicate must emit exactly ONE pair
    left = spark.createDataFrame([(1, 0, 100)], "lid int, ls long, le long")
    right = spark.createDataFrame([(7, 15, 95)], "rid int, rs long, re long")
    out = joins.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=10.0
    )
    assert out.count() == 1


def test_interval_overlap_half_open_touching_is_no_match(spark):
    left = spark.createDataFrame([(1, 0, 10)], "lid int, ls long, le long")
    right = spark.createDataFrame(
        [(7, 10, 20), (8, 9, 20)], "rid int, rs long, re long"
    )
    got = joins.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=10.0
    ).collect()
    assert [r.rid for r in got] == [8]  # [0,10) and [10,20) don't touch


def test_interval_overlap_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 1000, 1010)], "lid int, ls long, le long"
    )
    right = spark.createDataFrame([(7, 5, 8)], "rid int, rs long, re long")
    out = joins.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=10.0, how="left"
    ).collect()
    by_l = {r.lid: r for r in out}
    assert len(out) == 2
    assert by_l[1].rid == 7 and by_l[2].rid is None


def test_interval_overlap_matches_naive_cross_join(spark):
    rows = [(i, (i * 37) % 500, (i * 37) % 500 + 5 + (i % 40)) for i in range(80)]
    df = spark.createDataFrame(rows, "id int, s long, e long")
    fast = joins.interval_overlap_join(
        df.selectExpr("id as lid", "s as ls", "e as le"),
        df.selectExpr("id as rid", "s as rs", "e as re"),
        "ls", "le", "rs", "re", bucket_width=16.0,
    )
    naive = df.selectExpr("id as lid", "s as ls", "e as le").join(
        df.selectExpr("id as rid", "s as rs", "e as re"),
        (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")),
    )
    got = {(r.lid, r.rid) for r in fast.collect()}
    want = {(r.lid, r.rid) for r in naive.collect()}
    assert got == want


def test_resample_ffill_bridges_gaps_and_marks_observed(spark):
    df = spark.createDataFrame(
        [(1, 0, 100, 10.0), (1, 30, 101, 20.0), (1, 350, 102, 30.0)],
        "k int, ts long, id long, v double",
    )
    out = {
        r.bucket: (r.value, r.observed)
        for r in resample_ffill(df, ["k"], "ts", "id", "v", step_s=100).collect()
    }
    # bucket 0 keeps the LAST obs (ts=30); gap buckets carry it forward
    assert out[0] == (20.0, True)
    assert out[100] == (20.0, False)
    assert out[200] == (20.0, False)
    assert out[300] == (30.0, True)
    assert set(out) == {0, 100, 200, 300}


def test_rolling_zscore_warmup_and_spike(spark):
    rows = [(1, t, float(5 + (t % 2)), t) for t in range(12)]
    rows.append((1, 12, 500.0, 12))  # spike
    df = spark.createDataFrame(rows, "k int, t long, v double, id long")
    out = {
        r.t: r
        for r in rolling_zscore(
            df, ["k"], ["t", "id"], "v", n=10, threshold=2.0
        ).collect()
    }
    # fewer than 10 trailing points → no score
    for t in range(10):
        assert out[t].zscore is None and out[t].is_anomaly is None
    assert out[12].is_anomaly is True
    assert out[12].zscore > 100


def test_gini_impurity_bounds(spark):
    df = spark.createDataFrame(
        [("a", "x")] * 10 + [("b", c) for c in "uvwx" * 5],
        "g string, cls string",
    )
    got = {r.g: r for r in agg.gini_impurity(df, ["g"], "cls").collect()}
    assert got["a"].gini == 0.0 and got["a"].n_classes == 1
    # 4 equally likely classes → 1 - 4·(1/4)² = 0.75
    assert got["b"].gini == pytest.approx(0.75, abs=1e-12)
    assert got["b"].n == 20


def test_pagerank_uniform_cycle_and_mass(spark):
    # closed 3-cycle with equal weights → uniform ranks, total mass 1
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 0, 1)], "src int, dst int, w int"
    )
    ranks = {r.id: r.rank for r in pagerank(edges, weight="w", iters=5).collect()}
    assert all(math.isclose(v, 1 / 3, rel_tol=1e-9) for v in ranks.values())
    # hub pulls rank: two sources point at node 9
    edges2 = spark.createDataFrame(
        [(0, 9, 3), (1, 9, 1), (9, 0, 1), (9, 1, 1)],
        "src int, dst int, w int",
    )
    r2 = {r.id: r.rank for r in pagerank(edges2, weight="w", iters=10).collect()}
    assert r2[9] > r2[0] > 0 and r2[9] > r2[1]
    assert math.isclose(sum(r2.values()), 1.0, rel_tol=1e-6)


def test_sample_by_weight_rate_tracks_weight(spark):
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).alias("heavy"),
    )
    w = F.when(F.col("heavy"), F.lit(0.9)).otherwise(F.lit(0.1))
    kept = sampling.sample_by_weight(df, "doc_id", w, salt="t").groupBy(
        "heavy"
    ).count()
    rates = {r.heavy: r["count"] / (n / 2) for r in kept.collect()}
    assert abs(rates[True] - 0.9) < 0.02
    assert abs(rates[False] - 0.1) < 0.02
    # determinism: identical set on re-run
    a = sorted(
        r.doc_id
        for r in sampling.sample_by_weight(df, "doc_id", w, salt="t")
        .limit(50)
        .collect()
    )
    b = sorted(
        r.doc_id
        for r in sampling.sample_by_weight(df, "doc_id", w, salt="t")
        .limit(50)
        .collect()
    )
    assert a == b


def test_ewma_matches_reference_recursion(spark):
    from medallion_delta_lake_spark.operators.window import ewma_smooth

    vals = [10.0, 20.0, 5.0, 40.0, 40.0, 1.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k int, t long, v double"
    )
    out = {
        r.t: r.ewma
        for r in ewma_smooth(
            df, ["k"], ["t"], "v", alpha=0.25, lookback=16
        ).collect()
    }
    acc = vals[0]
    assert out[0] == acc
    for i, v in enumerate(vals[1:], start=1):
        acc = 0.25 * v + 0.75 * acc
        assert out[i] == acc, (i, out[i], acc)


def test_weighted_median_respects_weights(spark):
    from medallion_delta_lake_spark.operators import agg

    # values 1..4; weight mass concentrated on 4 pulls the median up
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 10.0)],
        "grp string, v double, w double",
    )
    got = agg.weighted_median(df, ["grp"], "v", "w").collect()[0]
    assert got.wmedian == 4.0
    # equal weights → ordinary type-1 median (lower of the middle pair)
    df2 = spark.createDataFrame(
        [("g", float(v), 1.0) for v in (1, 2, 3, 4)],
        "grp string, v double, w double",
    )
    assert agg.weighted_median(df2, ["grp"], "v", "w").collect()[0].wmedian == 2.0


def test_ks_two_sample_known_values(spark):
    from medallion_delta_lake_spark.operators import agg

    # disjoint supports → KS = 1
    rows = [(float(v), True) for v in range(5)] + [
        (float(v), False) for v in range(10, 15)
    ]
    df = spark.createDataFrame(rows, "v double, f boolean")
    r = agg.ks_two_sample(df, "v", "f").collect()[0]
    assert r.ks_stat == 1.0 and r.n_true == 5 and r.n_false == 5
    # identical samples → KS = 0
    rows2 = [(float(v), f) for v in range(5) for f in (True, False)]
    r2 = agg.ks_two_sample(
        spark.createDataFrame(rows2, "v double, f boolean"), "v", "f"
    ).collect()[0]
    assert r2.ks_stat == 0.0


def test_temperature_mixture_rates_sqrt_law(spark):
    import math as m

    from medallion_delta_lake_spark.operators.sampling import (
        temperature_mixture_rates,
    )

    df = spark.createDataFrame(
        [("big",)] * 900 + [("small",)] * 100, "src string"
    )
    rates = {r.src: r for r in temperature_mixture_rates(df, "src").collect()}
    assert rates["small"].keep_rate == 1.0  # smallest keeps everything
    assert rates["big"].keep_rate == m.sqrt(900.0 * 100.0) / 900.0


def test_chi_square_zero_for_independent_table(spark):
    from medallion_delta_lake_spark.operators import agg

    # perfectly proportional contingency table → chi2 == 0
    rows = []
    for r in ("a", "b"):
        for c, k in (("x", 2), ("y", 4)):
            rows += [(r, c)] * (k * (2 if r == "b" else 1))
    df = spark.createDataFrame(rows, "r string, c string")
    got = agg.chi_square_independence(df, "r", "c").collect()[0]
    assert got.chi2 == 0.0 and got.dof == 1 and got.n == 18
    # a fully determined table scores chi2 == n (2x2 extreme)
    df2 = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 5, "r string, c string"
    )
    got2 = agg.chi_square_independence(df2, "r", "c").collect()[0]
    assert got2.chi2 == 10.0


def test_percentile_bands_known_order_stats(spark):
    from medallion_delta_lake_spark.operators import agg

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "grp string, v double"
    )
    got = agg.percentile_bands(
        df, ["grp"], "v", (0.25, 0.5, 0.75, 0.95)
    ).collect()[0]
    assert (got.p25, got.p50, got.p75, got.p95) == (25.0, 50.0, 75.0, 95.0)


def test_vocab_overlap_disjoint_and_identical(spark):
    from medallion_delta_lake_spark.operators.text_analysis import (
        vocab_overlap,
    )

    df = spark.createDataFrame(
        [
            ("s1", "alpha beta gamma"),
            ("s2", "alpha beta gamma"),
            ("s3", "delta epsilon"),
        ],
        "source string, text string",
    )
    got = {
        (r.src_a, r.src_b): r for r in vocab_overlap(df).collect()
    }
    assert got[("s1", "s2")].jaccard == 1.0
    assert got[("s1", "s2")].n_common == 3
    assert ("s1", "s3") not in got  # zero overlap emits no row
    assert ("s2", "s3") not in got


def test_streaks_islands(spark):
    from medallion_delta_lake_spark.operators.window import streaks

    df = spark.createDataFrame(
        [(1, d) for d in (10, 11, 12, 14, 20, 21)] + [(2, 5)],
        "u int, day long",
    )
    got = {r.u: r for r in streaks(df, ["u"], "day").collect()}
    assert got[1].n_active_days == 6
    assert got[1].n_streaks == 3
    assert got[1].longest_streak == 3
    assert got[1].current_streak_end == 21
    assert got[2].longest_streak == 1 and got[2].n_streaks == 1


def test_asof_forward_picks_earliest_at_or_after(spark):
    from medallion_delta_lake_spark.operators import joins

    left = spark.createDataFrame(
        [(1, 10), (1, 15), (1, 100)], "k int, ts long"
    )
    right = spark.createDataFrame(
        [(1, 15, "a"), (1, 50, "b")], "k int, rts long, payload string"
    )
    out = {
        r.ts: r.payload
        for r in joins.asof_join_forward(
            left, right, ["k"], "ts", "rts", ["payload"]
        ).collect()
    }
    assert out[10] == "a"   # next at-or-after 10 is 15
    assert out[15] == "a"   # equal timestamp matches
    assert out[100] is None  # nothing after


def test_mann_whitney_known_values(spark):
    from medallion_delta_lake_spark.operators import agg

    # all true-values below all false-values → u_true = 0
    rows = [(float(v), True) for v in range(5)] + [
        (float(v), False) for v in range(10, 15)
    ]
    r = agg.mann_whitney_u(
        spark.createDataFrame(rows, "v double, f boolean"), "v", "f"
    ).collect()[0]
    assert r.u_true == 0.0 and r.u_false == 25.0
    # identical samples (full ties) → U splits evenly: n²/2 each
    rows2 = [(float(v), f) for v in range(4) for f in (True, False)]
    r2 = agg.mann_whitney_u(
        spark.createDataFrame(rows2, "v double, f boolean"), "v", "f"
    ).collect()[0]
    assert r2.u_true == 8.0 and r2.u_false == 8.0
    assert r2.u_true + r2.u_false == r2.n_true * r2.n_false
