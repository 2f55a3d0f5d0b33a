"""Operator-level edges for the round-8 additions — the parts a
single registered oracle query does not reach: guard rails, tie
handling, and the SCD-2 incremental==rebuild invariant on crafted
micro-cases."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import agg
from medallion_delta_lake_spark.operators.text_analysis import zipf_profile
from medallion_delta_lake_spark.operators.upsert import scd2_apply
from medallion_delta_lake_spark.operators.window import (
    regime_segments,
    rolling_slope,
)


def test_theil_sen_known_line_and_outlier(spark):
    # perfect line y = 2x + 1 with one wild outlier: the median slope
    # ignores it (OLS would not)
    rows = [(float(x), 2.0 * x + 1.0) for x in range(9)] + [(9.0, 500.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = agg.theil_sen(df, "x", "y").first()
    assert out["slope"] == 2.0
    assert out["n_points"] == 10
    assert out["n_pairs"] == 45


def test_theil_sen_size_guard(spark):
    big = spark.range(5001).selectExpr("id AS x", "id AS y")
    with pytest.raises(ValueError, match="max_points"):
        agg.theil_sen(big, "x", "y", max_points=4000)


def test_kendall_tau_perfect_and_reversed(spark):
    inc = spark.createDataFrame(
        [(i, float(i), float(i * 3)) for i in range(8)],
        "i long, x double, y double",
    )
    assert agg.kendall_tau(inc, "i", "x", "y").first()["tau_b"] == 1.0
    dec = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(8)],
        "i long, x double, y double",
    )
    assert agg.kendall_tau(dec, "i", "x", "y").first()["tau_b"] == -1.0


def test_kendall_tau_tie_counts(spark):
    # x has a tie (rows 0,1), y has a tie (rows 2,3)
    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, 1.0, 2.0), (2, 2.0, 5.0), (3, 3.0, 5.0)],
        "i long, x double, y double",
    )
    r = agg.kendall_tau(df, "i", "x", "y").first()
    assert r["ties_x"] == 1 and r["ties_y"] == 1
    assert r["concordant"] == 4 and r["discordant"] == 0


def test_count_min_never_underestimates(spark):
    df = spark.range(2000).selectExpr("id % 37 AS k")
    out = agg.count_min_estimate(
        df, "k", df.filter("k < 37"), depth=4, width=64
    ).collect()
    assert len(out) == 37
    assert all(r["overshoot"] >= 0 for r in out)
    # width >> keys: estimates should be exact for most keys
    exact = sum(1 for r in out if r["overshoot"] == 0)
    assert exact >= 30


def test_count_min_absent_probe_key(spark):
    df = spark.range(100).selectExpr("id % 5 AS k")
    probes = spark.createDataFrame([(99,)], "k long")
    r = agg.count_min_estimate(df, "k", probes, depth=4, width=64).first()
    assert r["exact_count"] == 0
    assert r["est_count"] >= 0  # may collide, never negative


def test_rolling_slope_exact_line(spark):
    # y = 3x: every full frame has slope exactly 3
    df = spark.createDataFrame(
        [(1, i, float(3 * i)) for i in range(1, 11)],
        "k int, t int, v double",
    )
    out = df.select(
        "t",
        rolling_slope(df, ["k"], ["t"], "v", window_rows=4).alias("s"),
    ).collect()
    by_t = {r["t"]: r["s"] for r in out}
    assert by_t[1] is None  # one-point frame: no slope
    assert all(by_t[t] == 3.0 for t in range(2, 11))


def test_regime_segments_runs(spark):
    df = spark.createDataFrame(
        [
            (1, 1, 10.0),
            (1, 2, 60.0),
            (1, 3, 70.0),
            (1, 4, 10.0),
            (2, 1, 90.0),
        ],
        "u int, t int, v double",
    )
    out = {
        (r["u"], r["segment"]): (r["regime"], r["n_rows"])
        for r in regime_segments(
            df, ["u"], ["t"], F.col("v") >= 50.0, "t"
        ).collect()
    }
    assert out == {
        (1, 1): (False, 1),
        (1, 2): (True, 2),
        (1, 3): (False, 1),
        (2, 1): (True, 1),
    }


def test_zipf_profile_head_is_rank_one(spark):
    df = spark.createDataFrame(
        [("a a a a b b b c c d",)], "text string"
    )
    out = {r["rank"]: r for r in zipf_profile(df, top_k=10).collect()}
    assert out[1]["token"] == "a" and out[1]["freq"] == 4
    assert out[1]["dev_from_head"] == 0
    assert out[2]["rank_freq"] == 6  # b: rank 2 × freq 3


def test_scd2_apply_micro_equivalence(spark):
    """Incremental apply == full rebuild on a crafted case covering:
    key with history + new changes, key with history + no changes,
    brand-new key, multi-change batch for one key."""
    from pyspark.sql import Window as W

    hist = [
        (1, "2024-01-01", "a"),
        (1, "2024-02-01", "b"),
        (2, "2024-01-15", "x"),
        (3, "2024-03-01", "p"),
    ]
    batch = [
        (1, "2024-04-01", "c"),
        (1, "2024-05-01", "d"),
        (4, "2024-04-10", "n"),
    ]

    def build(rows):
        df = spark.createDataFrame(
            rows, "k int, valid_from string, attr string"
        )
        w = W.partitionBy("k").orderBy("valid_from")
        return df.select(
            "k",
            "valid_from",
            F.lead("valid_from").over(w).alias("valid_to"),
            "attr",
        ).select(
            "k",
            "valid_from",
            "valid_to",
            "attr",
            F.col("valid_to").isNull().alias("is_current"),
        )

    dim = build(hist)
    batch_df = spark.createDataFrame(
        batch, "k int, valid_from string, attr string"
    )
    got = {
        tuple(r)
        for r in scd2_apply(dim, batch_df, key="k").collect()
    }
    want = {tuple(r) for r in build(hist + batch).collect()}
    assert got == want


def test_limb_double_exact_beyond_2_53(spark):
    # the value where DuckDB's int128 decimal→double cast measurably
    # lands 1 ulp off: limb conversion must equal Python's correctly
    # rounded float()
    from decimal import Decimal

    big = 31293724858271074718
    df = spark.createDataFrame([(Decimal(big),)], "x decimal(38,0)")
    out = df.select(agg.limb_double(F.col("x")).alias("d")).first()["d"]
    assert out == float(big)
    small = spark.createDataFrame([(Decimal(12345),)], "x decimal(38,0)")
    assert (
        small.select(agg.limb_double(F.col("x")).alias("d")).first()["d"]
        == 12345.0
    )


def test_kruskal_wallis_textbook_no_ties(spark):
    # groups {1,2,3},{4,5,6},{7,8,9}: ranks 1..9, H = 7.2 exactly
    rows = (
        [("a", float(v)) for v in (1, 2, 3)]
        + [("b", float(v)) for v in (4, 5, 6)]
        + [("c", float(v)) for v in (7, 8, 9)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    r = agg.kruskal_wallis(df, "v", "g", scale=1).first()
    assert r["n"] == 9 and r["n_groups"] == 3 and r["dof"] == 2
    assert abs(r["h_stat"] - 7.2) < 1e-12
    assert r["h_adj"] == r["h_stat"]  # no ties → C = 1


def test_kruskal_wallis_tie_correction(spark):
    # {1,1,2} vs {2,3,3}: midranks 1.5,1.5,3.5 | 3.5,5.5,5.5
    # H = 12/42·(6.5²/3 + 14.5²/3) − 21; C = 1 − 18/210
    rows = [("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = agg.kruskal_wallis(df, "v", "g", scale=1).first()
    h = 12.0 / 42.0 * (6.5**2 / 3 + 14.5**2 / 3) - 21.0
    assert abs(r["h_stat"] - h) < 1e-12
    assert abs(r["h_adj"] - h / (1.0 - 18.0 / 210.0)) < 1e-12


def test_jarque_bera_symmetric_micro(spark):
    # {1,2,2,3}: skew 0, m2 = .5, m4 = .5 → kurt 2, JB = 4/6·(1/4)
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 3.0)],
        "g string, v double",
    )
    r = agg.jarque_bera(df, "v", "g", scale=1).first()
    assert r["skewness"] == 0.0
    assert abs(r["kurtosis"] - 2.0) < 1e-12
    assert abs(r["jb_stat"] - 4.0 / 6.0 * 0.25) < 1e-12


def test_jarque_bera_cents_scale_invariance(spark):
    # the standardized moments must not depend on the cents scale
    rows = [("g", v) for v in (1.37, 2.11, 2.11, 9.40, 3.55)]
    df = spark.createDataFrame(rows, "g string, v double")
    a = agg.jarque_bera(df, "v", "g", scale=100).first()
    b = agg.jarque_bera(df, "v", "g", scale=1000).first()
    assert abs(a["skewness"] - b["skewness"]) < 1e-9
    assert abs(a["jb_stat"] - b["jb_stat"]) < 1e-9


def test_aspect_bucket_assign_known_ratios(spark):
    from medallion_delta_lake_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, 1920, 1080), (2, 1000, 1000), (3, 800, 600), (4, 600, 900)],
        "doc_id long, width int, height int",
    )
    out = {
        r["doc_id"]: (r["bucket_w"], r["bucket_h"], r["ratio_err_scaled"])
        for r in mm.aspect_bucket_assign(df).collect()
    }
    assert out[1] == (16, 9, 0)
    assert out[2] == (1, 1, 0)
    assert out[3] == (4, 3, 0)
    assert out[4] == (2, 3, 0)


def test_aspect_bucket_tie_breaks_on_order(spark):
    from medallion_delta_lake_spark.operators import multimodal as mm

    # 7:6 is exactly halfway between 1:1 (err 144) and 4:3 (err 144);
    # bucket order makes 1:1 the deterministic winner
    df = spark.createDataFrame(
        [(1, 7, 6)], "doc_id long, width int, height int"
    )
    r = mm.aspect_bucket_assign(df).first()
    assert (r["bucket_w"], r["bucket_h"]) == (1, 1)
    assert r["ratio_err_scaled"] == 144


def test_aspect_bucket_batches_padding(spark):
    from medallion_delta_lake_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(i, 1920, 1080) for i in range(130)],
        "doc_id long, width int, height int",
    )
    plan = mm.aspect_bucket_batches(
        mm.aspect_bucket_assign(df), batch_size=64
    ).first()
    assert plan["n_images"] == 130
    assert plan["n_batches"] == 3
    assert plan["pad_waste"] == 62


def test_rolling_autocorr_linear_series_is_one(spark):
    from medallion_delta_lake_spark.operators.window import rolling_autocorr

    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(1, 31)],
        "k string, i long, v double",
    )
    rows = rolling_autocorr(
        df, ["k"], ["i"], "v", window_rows=20, min_pairs=5
    ).collect()
    full = [r for r in rows if r["n_pairs"] >= 5]
    assert full and all(
        abs(r["roll_autocorr"] - 1.0) < 1e-9 for r in full
    )
    # warm-up frames below min_pairs stay NULL
    assert all(
        r["roll_autocorr"] is None for r in rows if r["n_pairs"] < 5
    )


def test_rolling_autocorr_constant_series_is_null(spark):
    from medallion_delta_lake_spark.operators.window import rolling_autocorr

    df = spark.createDataFrame(
        [("k", i, 5.0) for i in range(20)], "k string, i long, v double"
    )
    rows = rolling_autocorr(df, ["k"], ["i"], "v").collect()
    assert all(r["roll_autocorr"] is None for r in rows)


def test_rolling_autocorr_alternating_is_minus_one(spark):
    from medallion_delta_lake_spark.operators.window import rolling_autocorr

    df = spark.createDataFrame(
        [("k", i, 1.0 if i % 2 == 0 else -1.0) for i in range(20)],
        "k string, i long, v double",
    )
    rows = rolling_autocorr(df, ["k"], ["i"], "v").collect()
    full = [r for r in rows if r["n_pairs"] >= 5]
    assert full and all(
        abs(r["roll_autocorr"] + 1.0) < 1e-9 for r in full
    )


def test_jaccard_neighbors_micro(spark):
    from medallion_delta_lake_spark.operators.graph import jaccard_neighbors

    edges = spark.createDataFrame(
        [(1, "w1"), (1, "w2"), (1, "w3"),
         (2, "w2"), (2, "w3"), (2, "w4"),
         (3, "w9")],
        "n long, w string",
    )
    out = jaccard_neighbors(edges, "n", "w", max_degree=10, min_common=2)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["n_common"]) == (1, 2, 2)
    assert r["deg_a"] == 3 and r["deg_b"] == 3
    assert r["jaccard"] == 0.5


def test_jaccard_neighbors_hub_cap_drops_hub_and_its_degree(spark):
    from medallion_delta_lake_spark.operators.graph import jaccard_neighbors

    # hub neighbor 'h' touches 4 nodes; with max_degree=3 it is
    # dropped BEFORE degrees are counted, so pairs only share 'w'
    edges = spark.createDataFrame(
        [(i, "h") for i in (1, 2, 3, 4)] + [(1, "w"), (2, "w")],
        "n long, w string",
    )
    out = jaccard_neighbors(edges, "n", "w", max_degree=3, min_common=1)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"]) == (1, 2)
    assert r["deg_a"] == 1 and r["deg_b"] == 1 and r["jaccard"] == 1.0


def test_jaccard_neighbors_min_common_prunes(spark):
    from medallion_delta_lake_spark.operators.graph import jaccard_neighbors

    edges = spark.createDataFrame(
        [(1, "w1"), (2, "w1"), (2, "w2"), (3, "w2")],
        "n long, w string",
    )
    assert (
        jaccard_neighbors(edges, "n", "w", min_common=2).count() == 0
    )


def test_corr_matrix_known_values(spark):
    # x and y=2x perfectly correlated; z anti-correlated with x
    rows = [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {
        (r["var_x"], r["var_y"]): r["corr"]
        for r in agg.corr_matrix(df, ["x", "y", "z"]).collect()
    }
    assert abs(out[("x", "y")] - 1.0) < 1e-12
    assert abs(out[("x", "z")] + 1.0) < 1e-12
    assert abs(out[("y", "z")] + 1.0) < 1e-12


def test_corr_matrix_constant_column_is_null(spark):
    rows = [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)]
    df = spark.createDataFrame(rows, "x double, c double")
    r = agg.corr_matrix(df, ["x", "c"]).first()
    assert r["corr"] is None


def test_corr_matrix_null_rows_dropped_everywhere(spark):
    rows = [(1.0, 1.0, None), (2.0, 2.0, 1.0), (3.0, 3.0, 2.0),
            (4.0, 4.0, 3.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = agg.corr_matrix(df, ["x", "y", "z"]).collect()
    assert all(r["n"] == 3 for r in out)  # the null row drops for ALL pairs


def test_balanced_downsample_exact_min_per_class(spark):
    from medallion_delta_lake_spark.operators.sampling import (
        balanced_downsample,
    )

    rows = (
        [(i, "a") for i in range(10)]
        + [(100 + i, "b") for i in range(4)]
        + [(200 + i, "c") for i in range(7)]
    )
    df = spark.createDataFrame(rows, "id long, cls string")
    out = balanced_downsample(df, "cls", "id")
    counts = {
        r["cls"]: r["n"]
        for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 4, "b": 4, "c": 4}
    # deterministic: the same input yields the same ids
    first = sorted(r["id"] for r in out.collect())
    again = sorted(r["id"] for r in balanced_downsample(df, "cls", "id").collect())
    assert first == again


def test_herfindahl_extremes(spark):
    qs = __import__("__spark_entry__").queries()
    out = {
        r["nation"]: r
        for r in qs["agg-herfindahl"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    for r in out.values():
        assert 1.0 / r["n_suppliers"] <= r["hhi"] <= 1.0 + 1e-12
