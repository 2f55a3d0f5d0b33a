"""Edge cases for the round-7 operators beyond the oracle sweep's
single registered query per op: max-drawdown on monotone /
all-falling / null-bearing series, and Spearman's exact tie midranks
plus its ±1 bounds on perfectly monotone data."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.operators.window import max_drawdown


def _dd(spark, rows):
    df = spark.createDataFrame(rows, "k int, t int, v double")
    out = max_drawdown(
        df, key_cols=["k"], order_cols=["t"], val_col="v"
    ).collect()
    return {r.k: (r.max_drawdown, r.peak, r.n_points) for r in out}


def test_max_drawdown_monotone_rise_is_zero(spark):
    got = _dd(spark, [(1, t, float(t)) for t in range(5)])
    assert got[1] == (0.0, 4.0, 5)


def test_max_drawdown_all_falling_is_full_range(spark):
    got = _dd(spark, [(1, t, float(10 - t)) for t in range(5)])
    assert got[1] == (4.0, 10.0, 5)


def test_max_drawdown_recovery_keeps_the_trough(spark):
    # rise to 10, drop to 3 (dd 7), recover to 20, drop to 15 (dd 5)
    series = [10.0, 3.0, 20.0, 15.0]
    got = _dd(spark, [(1, t, v) for t, v in enumerate(series)])
    assert got[1] == (7.0, 20.0, 4)


def test_max_drawdown_order_column_decides(spark):
    # same values, reversed order → different drawdown
    series = [(0, 5.0), (1, 1.0)]
    fwd = _dd(spark, [(1, t, v) for t, v in series])
    rev = _dd(spark, [(1, 1 - t, v) for t, v in series])
    assert fwd[1][0] == 4.0
    assert rev[1][0] == 0.0


def test_spearman_bounds_on_monotone_data(spark):
    """ρ must be exactly ±1 on perfectly monotone tie-free data, and
    the midrank tie handling must equal the textbook average rank."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # replicate the registered query's rank-map machinery on a tiny
    # frame via the same formula: doubled midrank = 2·cum + c + 1
    def spearman(pairs):
        df = spark.createDataFrame(pairs, "x double, y double")

        def rank_map(col, out):
            freq = df.groupBy(F.col(col).alias("_v")).agg(
                F.count(F.lit(1)).alias("_c")
            )
            cum = F.coalesce(
                F.sum("_c").over(
                    Window.orderBy("_v").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
            return freq.select(
                F.col("_v").alias(f"_v{out}"),
                (2 * cum + F.col("_c") + 1)
                .cast("bigint")
                .alias(out),
            )

        j = df.join(
            rank_map("x", "dx"), F.col("x") == F.col("_vdx")
        ).join(rank_map("y", "dy"), F.col("y") == F.col("_vdy"))
        row = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dx").alias("sx"),
            F.sum("dy").alias("sy"),
            F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
            F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
            F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        ).first()
        n = row["n"]
        num = n * row["sxy"] - row["sx"] * row["sy"]
        den = (
            (n * row["sxx"] - row["sx"] ** 2)
            * (n * row["syy"] - row["sy"] ** 2)
        ) ** 0.5
        return num / den

    up = [(float(i), float(i * i)) for i in range(1, 8)]
    assert spearman(up) == pytest.approx(1.0)
    down = [(float(i), float(-i)) for i in range(1, 8)]
    assert spearman(down) == pytest.approx(-1.0)
    # ties: x = (1,2,2,3) midranks (1, 2.5, 2.5, 4) → doubled
    # (2, 5, 5, 8); Pearson vs ranks (1,2,3,4) = 4.5/√(4.5·5) = √0.9
    tied = [(1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)]
    assert spearman(tied) == pytest.approx(0.9 ** 0.5)


def test_registered_r7_queries_run_at_sf0001(spark):
    import __spark_entry__ as e

    q = e.queries()
    for name in ("window-max-drawdown", "stats-spearman-rho"):
        df = q[name](spark, "/root/testdata/sf0.001")
        assert df.count() > 0


def test_cusum_drift_known_series(spark):
    """CUSUM with target 0: prefix sums P=(1,-1,2,5), running min
    (1,-1,-1,-1) → excursions (0,0,3,6) → max 6. All-below-target
    series clamps to 0."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators.window import cusum_drift

    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, -2.0), (1, 2, 3.0), (1, 3, 3.0),
         (2, 0, -1.0), (2, 1, -1.0)],
        "k int, t int, v double",
    )
    out = {
        r.k: (r.cusum_max, r.n_points)
        for r in cusum_drift(
            df, ["k"], ["t"], "v", F.lit(0.0)
        ).collect()
    }
    assert out[1] == (6.0, 4)
    assert out[2] == (0.0, 2)


def test_mixture_epochs_copy_counts(spark):
    """floor(e) copies always; the fractional extra decided by hash;
    zero-epoch strata vanish; epoch_idx is a clean 0..n-1 range."""
    from medallion_delta_lake_spark.operators.sampling import (
        mixture_epochs,
    )

    df = spark.createDataFrame(
        [(i, "a" if i < 50 else ("z" if i < 80 else "cut"))
         for i in range(100)],
        "doc_id long, src string",
    )
    out = mixture_epochs(
        df, "doc_id", "src", {"a": 2.5, "cut": 0.0}, default_epochs=1.0
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.epoch_idx)
    # "cut" rows vanish entirely
    assert all(d < 80 for d in by_doc)
    # default stratum: exactly one copy
    for d in range(50, 80):
        assert by_doc[d] == [0]
    # 2.5-epoch stratum: 2 or 3 copies, contiguous indexes
    counts = {len(v) for d, v in by_doc.items() if d < 50}
    assert counts <= {2, 3} and counts == {2, 3}
    for d in range(50):
        assert sorted(by_doc[d]) == list(range(len(by_doc[d])))
    # ~half get the fractional copy (hash-decided, deterministic)
    n3 = sum(1 for d, v in by_doc.items() if d < 50 and len(v) == 3)
    assert 10 <= n3 <= 40


def test_asof_tolerance_nulls_stale_matches(spark):
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators.joins import (
        asof_join_tolerance,
    )

    left = spark.createDataFrame(
        [(1, 100), (1, 250), (2, 100)], "k int, t long"
    )
    right = spark.createDataFrame(
        [(1, 90, 9.0), (1, 95, 9.5)], "k int, rt long, pay double"
    )
    out = {
        (r.k, r.t): r.pay
        for r in asof_join_tolerance(
            left,
            right,
            keys=["k"],
            left_ts="t",
            right_ts="rt",
            payload_cols=["pay"],
            tolerance=F.lit(50),
        ).collect()
    }
    assert out[(1, 100)] == 9.5  # 5s stale: within tolerance
    assert out[(1, 250)] is None  # 155s stale: nulled
    assert out[(2, 100)] is None  # no match at all


def test_frame_neardup_finds_planted_video_dups(spark):
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators.multimodal import (
        frame_neardup_pairs,
    )

    base = [(i, f"clip-{i}-" + "x" * 300 + f"tail{i}") for i in range(6)]
    planted = base + [(100 + i, t) for i, t in base[:2]]  # 2 re-uploads
    df = spark.createDataFrame(planted, "doc_id long, text string").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = {
        (r.id_a, r.id_b): r.n_shared_frames
        for r in frame_neardup_pairs(
            df, min_shared_frames=2
        ).collect()
    }
    # each planted copy matches its original on all 4 frames
    assert out[(0, 100)] == 4
    assert out[(1, 101)] == 4


def test_stream_cusum_matches_batch_across_microbatches(spark, tmp_path):
    """The streaming CUSUM's state must span microbatches: feeding the
    per-user-ordered series as two time-split files (one per batch)
    yields the same final statistic as the batch closed form."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators.window import cusum_drift
    from medallion_delta_lake_spark.streaming import stateful
    from medallion_delta_lake_spark.streaming import events as se

    rows = [
        (u, i, float(v))
        for u in (1, 2)
        for i, v in enumerate([3, 9, 1, 12, 8, 2, 14, 6])
    ]
    df = spark.createDataFrame(rows, "user_id long, n int, value double").select(
        "user_id",
        F.to_timestamp(F.lit("2024-01-01")).alias("t0"),
        (F.col("n") * 60).alias("off"),
        F.col("n").cast("long").alias("event_id"),
        "value",
    ).select(
        "user_id",
        (F.col("t0") + F.make_interval(secs=F.col("off"))).alias("ts"),
        "event_id",
        "value",
    )
    src = str(tmp_path / "cusum_src")
    # time-split files: earlier half lands first (ordered arrival)
    df.filter(F.col("event_id") < 4).coalesce(1).write.parquet(src)
    df.filter(F.col("event_id") >= 4).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = se.run_available_now(
        stateful.cusum_monitor(sdf, target=5.0), "update", spark
    )
    # update mode re-emits per batch: keep the LAST emission per user
    final = {}
    for r in out.collect():
        final[r.user_id] = (r.cusum_max, r.n_points)

    batch = {
        r.user_id: (r.cusum_max, r.n_points)
        for r in cusum_drift(
            df, ["user_id"], ["ts", "event_id"], "value", F.lit(5.0)
        ).collect()
    }
    assert set(final) == {1, 2}
    for u in final:
        assert final[u][1] == 8
        assert final[u] == batch[u], (final[u], batch[u])
