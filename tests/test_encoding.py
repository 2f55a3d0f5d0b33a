"""Feature encoders (operators/encoding.py, pre-built r10): OOF
target encoding's leakage guarantee and exact values; feature
hashing's determinism, column-identity separation, and sign
unbiasedness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import encoding as enc


@pytest.fixture(scope="module")
def cat_df(spark):
    rows = [
        (i, "a" if i % 3 == 0 else "b", (i % 7) * 100)
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "id long, cat string, t long"
    ).cache()


def test_oof_encoding_matches_hand_computation(spark, cat_df):
    out = {
        (r["cat"], r["fold"]): (r["n_out"], r["sum_out"], r["enc_q6"])
        for r in enc.target_encode_oof(
            cat_df, "cat", "t", "id", folds=4
        ).collect()
    }
    rows = cat_df.select(
        "cat", "t", enc.assign_fold("id", 4).alias("fold")
    ).collect()
    from collections import defaultdict

    n_c, s_c = defaultdict(int), defaultdict(int)
    n_cf, s_cf = defaultdict(int), defaultdict(int)
    for r in rows:
        n_c[r["cat"]] += 1
        s_c[r["cat"]] += r["t"]
        n_cf[(r["cat"], r["fold"])] += 1
        s_cf[(r["cat"], r["fold"])] += r["t"]
    for cat in ("a", "b"):
        for f in range(4):
            n_out = n_c[cat] - n_cf[(cat, f)]
            s_out = s_c[cat] - s_cf[(cat, f)]
            want = (
                (abs(s_out) * 10**6 // n_out)
                * (1 if s_out >= 0 else -1)
                if n_out >= 1
                else None
            )
            assert out[(cat, f)] == (n_out, s_out, want), (cat, f)


def test_oof_excludes_own_fold(spark, cat_df):
    """Leakage check: perturb every fold-0 target massively; fold-0's
    OWN encoding must not move, every other fold's must."""
    base = {
        (r["cat"], r["fold"]): r["enc_q6"]
        for r in enc.target_encode_oof(
            cat_df, "cat", "t", "id", folds=4
        ).collect()
    }
    poisoned = cat_df.withColumn(
        "t",
        F.when(
            enc.assign_fold("id", 4) == 0, F.lit(10**9)
        ).otherwise(F.col("t")),
    )
    after = {
        (r["cat"], r["fold"]): r["enc_q6"]
        for r in enc.target_encode_oof(
            poisoned, "cat", "t", "id", folds=4
        ).collect()
    }
    for cat in ("a", "b"):
        assert base[(cat, 0)] == after[(cat, 0)]  # own fold excluded
        for f in (1, 2, 3):
            assert base[(cat, f)] != after[(cat, f)]


def test_oof_empty_outfold_is_null(spark):
    # a category entirely inside one fold: that fold has n_out = 0
    df = spark.createDataFrame(
        [(1, "only", 5)], "id long, cat string, t long"
    )
    out = {
        r["fold"]: r["enc_q6"]
        for r in enc.target_encode_oof(
            df, "cat", "t", "id", folds=3
        ).collect()
    }
    f = enc.assign_fold("id", 3)
    own = df.select(f.alias("f")).first()["f"]
    assert out[own] is None
    assert all(v == 5 * 10**6 for k, v in out.items() if k != own)


def test_feature_hash_determinism_and_separation(spark):
    df = spark.createDataFrame(
        [(1, "US", "US"), (2, "US", None)],
        "id long, country string, source string",
    )
    out = enc.feature_hash(
        df, ["country", "source"], "id", dim=1 << 16
    )
    rows = {(r["row_id"], r["idx"]): r["val"] for r in out.collect()}
    # row 1 has two cells; same VALUE, different COLUMN → different idx
    r1 = [k for k in rows if k[0] == 1]
    assert len(r1) == 2
    # row 2's country cell hashes identically to row 1's
    r2 = [k for k in rows if k[0] == 2]
    assert len(r2) == 1
    assert r2[0][1] in {k[1] for k in r1}
    # repartition-invariant
    out2 = enc.feature_hash(
        df.repartition(3), ["country", "source"], "id", dim=1 << 16
    )
    assert rows == {
        (r["row_id"], r["idx"]): r["val"] for r in out2.collect()
    }


def test_feature_hash_signs_roughly_balance(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)], "id long, c string"
    )
    out = enc.feature_hash(df, ["c"], "id", dim=1 << 20)
    s = out.agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    ).first()
    assert s["n"] == 2000
    assert abs(s["s"]) < 200  # ±1 signs ~balance (4.5σ)
