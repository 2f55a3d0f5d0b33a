"""Mergeable sketches (operators/sketches.py, pre-built r10):
HLL register tables, KMV bottom-k, Count-Min — accuracy vs exact,
the merge laws, and DuckDB mirrors proving the r11 oracle faces are
engine-exact before they are ever registered."""

from __future__ import annotations

import math

import duckdb
import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import sketches as sk

# deterministic synthetic sets: src 'a' has 5000 distinct ids, 'b'
# has 3000, overlapping a in [2000, 5000) → |a∩b| = 3000? no:
# b = [2000, 5000) → 3000 ids, all inside a. Use b = [3000, 6000).
A_IDS = list(range(5000))
B_IDS = list(range(3000, 6000))


@pytest.fixture(scope="module")
def sets_df(spark):
    rows = [("a", f"id{i}") for i in A_IDS] + [
        ("b", f"id{i}") for i in B_IDS
    ]
    # duplicate every third row — sketches must be duplicate-blind
    rows += rows[::3]
    return spark.createDataFrame(rows, "src string, v string").cache()


# ------------------------------------------------------------ HLL


def test_hll_estimate_accuracy(spark, sets_df):
    parts = sk.hll_partials(sets_df, ["src"], "v", p=10)
    est = {
        r["src"]: (r["est_q6"] / 1e6, r["v_zero"], r["m"])
        for r in sk.hll_estimate(parts, ["src"], p=10).collect()
    }
    # raw estimator, no corrections: allow 3 standard errors
    # (1.04/sqrt(1024) = 3.25% → 10%)
    for src, n_true in (("a", 5000), ("b", 3000)):
        raw, v_zero, m = est[src]
        # linear-counting branch the module deliberately leaves to
        # the caller (libm quarantine): apply it here as documented
        n_hat = (
            m * math.log(m / v_zero)
            if raw <= 2.5 * m and v_zero > 0
            else raw
        )
        assert abs(n_hat - n_true) / n_true < 0.10, (src, n_hat)


def test_hll_merge_equals_whole(spark, sets_df):
    whole = sk.hll_partials(sets_df, ["src"], "v", p=8)
    half1 = sk.hll_partials(
        sets_df.filter(F.length("v") <= 5), ["src"], "v", p=8
    )
    half2 = sk.hll_partials(
        sets_df.filter(F.length("v") > 5), ["src"], "v", p=8
    )
    merged = sk.hll_merge(half1.unionByName(half2), ["src"])
    a = {tuple(r) for r in whole.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b  # register-exact, not just estimate-close


def test_hll_duckdb_mirror(spark, sets_df):
    """The full register → s_pow → est_q6 chain reproduces
    bit-for-bit in DuckDB — the r11 oracle face is safe."""
    pdf = sets_df.select("src", "v").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = {
        (r[0], r[1], r[2], r[3], r[4])
        for r in con.sql(
            """
            WITH h AS (
              SELECT src,
                CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))
                     AS BIGINT) AS h
              FROM t
            ), regs AS (
              SELECT src, h & 1023 AS reg,
                CASE WHEN (h >> 10) = 0 THEN 51
                     ELSE 51 - length(bin(h >> 10)) END AS r
              FROM h
            ), reg_max AS (
              SELECT src, reg, MAX(r) AS r FROM regs GROUP BY src, reg
            ), agg AS (
              SELECT src, COUNT(*) AS n_present,
                SUM((CAST(1 AS BIGINT) << (51 - r))) AS s_present
              FROM reg_max GROUP BY src
            )
            SELECT src, 1024 AS m,
              CAST(1024 - n_present AS INT) AS v_zero,
              s_present + (1024 - n_present)
                * (CAST(1 AS BIGINT) << 51) AS s_pow,
              CAST(
                (CAST(7213 AS HUGEINT) * 1024 * 1024 * 1024
                 * (CAST(1 AS HUGEINT) << 51) * 1000000)
                // ((10000 * 1024 + 10790)
                    * (s_present + (1024 - n_present)
                       * (CAST(1 AS HUGEINT) << 51)))
                AS BIGINT) AS est_q6
            FROM agg
            """
        ).fetchall()
    }
    parts = sk.hll_partials(sets_df, ["src"], "v", p=10)
    got_spark = {
        (r["src"], r["m"], r["v_zero"], r["s_pow"], r["est_q6"])
        for r in sk.hll_estimate(parts, ["src"], p=10).collect()
    }
    assert got_spark == got_duck


# ------------------------------------------------------------ KMV


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("x", f"v{i}") for i in range(40) for _ in range(3)],
        "src string, v string",
    )
    parts = sk.kmv_partials(df, ["src"], "v", k=64)
    row = sk.kmv_estimate(parts, ["src"], k=64).collect()[0]
    assert row["n_kept"] == 40
    assert row["est_q6"] == 40 * 10**6  # exact, not estimated


def test_kmv_estimate_accuracy(spark, sets_df):
    parts = sk.kmv_partials(sets_df, ["src"], "v", k=256)
    est = {
        r["src"]: r["est_q6"] / 1e6
        for r in sk.kmv_estimate(parts, ["src"], k=256).collect()
    }
    # std err ~ 1/sqrt(k-1) = 6.3%; allow 3σ = 19%
    assert abs(est["a"] - 5000) / 5000 < 0.19
    assert abs(est["b"] - 3000) / 3000 < 0.19


def test_kmv_merge_law(spark, sets_df):
    whole = sk.kmv_partials(sets_df, ["src"], "v", k=128)
    h1 = sk.kmv_partials(
        sets_df.filter(F.length("v") <= 5), ["src"], "v", k=128
    )
    h2 = sk.kmv_partials(
        sets_df.filter(F.length("v") > 5), ["src"], "v", k=128
    )
    merged = sk.kmv_merge(h1.unionByName(h2), ["src"], k=128)
    assert {tuple(r) for r in whole.collect()} == {
        tuple(r) for r in merged.collect()
    }


def test_kmv_set_ops(spark, sets_df):
    k = 256
    parts = sk.kmv_partials(sets_df, ["src"], "v", k=k)
    a = parts.filter(F.col("src") == "a").select("h")
    b = parts.filter(F.col("src") == "b").select("h")
    row = sk.kmv_set_ops(a, b, k=k).collect()[0]
    # truth: |A|=5000 |B|=3000 |A∩B|=2000 |A∪B|=6000 J=1/3
    assert abs(row["union_est_q6"] / 1e6 - 6000) / 6000 < 0.19
    assert abs(row["jaccard_q6"] / 1e6 - 1 / 3) < 0.12
    inter = row["inter_est_q6"] / 1e6
    assert abs(inter - 2000) / 2000 < 0.30  # two estimators compound
    # internal consistency: inter == trunc(x_both·union/x_n) exactly
    assert row["inter_est_q6"] == (
        row["x_both"] * row["union_est_q6"] // row["x_n"]
    )


# ------------------------------------------------------ Count-Min


@pytest.fixture(scope="module")
def freq_df(spark):
    # zipf-ish: item i appears (200 - i) times for i in [0, 200)
    rows = [
        ("s", f"item{i}") for i in range(200) for _ in range(200 - i)
    ]
    return spark.createDataFrame(rows, "src string, v string")


def test_cms_never_underestimates_and_is_tight(spark, freq_df):
    sketch = sk.cms_partials(freq_df, [], "v", d=4, w=1024)
    probes = spark.createDataFrame(
        [(f"item{i}",) for i in range(200)], "v string"
    )
    est = {
        r["probe"]: r["est_cnt"]
        for r in sk.cms_query(sketch, probes, "v", d=4, w=1024).collect()
    }
    n_total = freq_df.count()
    over = 0
    for i in range(200):
        true = 200 - i
        assert est[f"item{i}"] >= true  # CMS hard guarantee
        over += est[f"item{i}"] - true
        # ε = e/w → error bound εN per item (generous check)
        assert est[f"item{i}"] - true <= math.e / 1024 * n_total * 4
    # with w=1024 ≫ 200 items, most probes should be exact
    assert over / 200 < 5


def test_cms_absent_item_and_merge(spark, freq_df):
    h1 = sk.cms_partials(
        freq_df.filter(F.length("v") <= 5), [], "v", d=4, w=512
    )
    h2 = sk.cms_partials(
        freq_df.filter(F.length("v") > 5), [], "v", d=4, w=512
    )
    merged = sk.cms_merge(h1.unionByName(h2), [])
    whole = sk.cms_partials(freq_df, [], "v", d=4, w=512)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }
    probes = spark.createDataFrame([("nope",)], "v string")
    row = sk.cms_query(whole, probes, "v", d=4, w=512).collect()[0]
    assert row["est_cnt"] >= 0  # may collide, never negative


def test_cms_apply_changes_equals_rebuild(spark, tmp_path):
    """Turnstile maintenance: fold a real Delta change feed (UPDATE
    pre/post pairs + DELETEs) into a CMS and land exactly on the
    from-scratch sketch of the final table state."""
    from medallion_delta_lake_spark.sources import delta_log

    p = str(tmp_path / "cms_cdc")
    rows = [(i, f"item{i % 7}") for i in range(60)]
    delta_log.write_delta(
        spark,
        spark.createDataFrame(rows, "k int, v string").coalesce(1),
        p,
    )
    delta_log.set_table_properties(
        p, {"delta.enableChangeDataFeed": "true"}
    )
    v0 = delta_log.resolve_snapshot(p)["version"]
    sketch = sk.cms_partials(
        delta_log.read_delta(spark, p), [], "v", d=4, w=128
    )
    # churn: rewrite every k<20 row's item, delete k>=50
    delta_log.update_delta_log(
        spark, p, [("k", "<", 20)], {"v": "concat(v, '_x')"}
    )
    delta_log.delete_delta_log(spark, p, [("k", ">=", 50)])
    changes = delta_log.table_changes(spark, p, v0 + 1)
    maintained = sk.cms_apply_changes(sketch, changes, "v", d=4, w=128)
    rebuilt = sk.cms_partials(
        delta_log.read_delta(spark, p), [], "v", d=4, w=128
    )
    assert {tuple(r) for r in maintained.collect()} == {
        tuple(r) for r in rebuilt.collect()
    }


# ------------------------------------------------------- Bloom


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(2000)], "v string"
    )
    sketch = sk.bloom_partials(members, "v", m_bits=1 << 15, k=4)
    assert sketch.count() <= (1 << 15) // 32
    # every member must survive the semi-join (no false negatives)
    kept = sk.bloom_semi_join(
        members, sketch, "v", m_bits=1 << 15, k=4
    )
    assert kept.count() == 2000
    # non-members: fp rate ~ (1 - e^(-k n/m))^k = (1-e^-0.244)^4
    # ~ 0.22%... generous bound 3%
    others = spark.createDataFrame(
        [(f"x{i}",) for i in range(3000)], "v string"
    )
    fp = sk.bloom_semi_join(
        others, sketch, "v", m_bits=1 << 15, k=4
    ).count()
    assert fp / 3000 < 0.03, fp


def test_bloom_merge_equals_whole(spark):
    df = spark.createDataFrame(
        [(f"m{i}",) for i in range(1000)], "v string"
    )
    whole = sk.bloom_partials(df, "v", m_bits=1 << 12, k=3)
    h1 = sk.bloom_partials(
        df.filter(F.length("v") <= 3), "v", m_bits=1 << 12, k=3
    )
    h2 = sk.bloom_partials(
        df.filter(F.length("v") > 3), "v", m_bits=1 << 12, k=3
    )
    merged = sk.bloom_merge(h1.unionByName(h2))
    assert {tuple(r) for r in whole.collect()} == {
        tuple(r) for r in merged.collect()
    }


def test_bloom_duckdb_mirror(spark):
    """Block table reproduces bit-for-bit in DuckDB — an r11-or-later
    oracle face is available if wanted."""
    df = spark.createDataFrame(
        [(f"m{i}",) for i in range(500)], "v string"
    )
    m_bits, k = 1 << 12, 3
    got_spark = {
        tuple(r)
        for r in sk.bloom_partials(df, "v", m_bits=m_bits, k=k)
        .collect()
    }
    from medallion_delta_lake_spark.functions.hashing import (
        h64_sql,
        minhash_params,
        perm_hash_sql,
    )

    params = minhash_params(k)
    probes = " UNION ALL ".join(
        f"SELECT ({perm_hash_sql(h64_sql('v'), a, b)}) % {m_bits}"
        f" AS pos FROM t"
        for a, b in params
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    got_duck = {
        tuple(r)
        for r in con.sql(
            f"""
            WITH p AS ({probes})
            SELECT pos >> 5 AS block,
              BIT_OR(CAST(1 AS BIGINT) << CAST(pos & 31 AS INT))
                AS bits
            FROM p GROUP BY 1
            """
        ).fetchall()
    }
    assert got_spark == got_duck


# --------------------------------------------------- HDR histogram


def test_hdr_quantiles_within_relative_bound(spark):
    import random

    rng = random.Random(7)
    vals = [int(rng.lognormvariate(8, 2)) + 1 for _ in range(20000)]
    df = spark.createDataFrame(
        [("k", v) for v in vals], "g string, v long"
    )
    parts = sk.hdr_partials(df, ["g"], "v", sub_bits=5)
    est = {
        r["q_permille"]: r["est"]
        for r in sk.hdr_quantiles(
            parts, ["g"], qs=(0.5, 0.9, 0.99)
        ).collect()
    }
    sv = sorted(vals)
    import math

    for qp in (500, 900, 990):
        exact = sv[math.ceil(len(sv) * qp / 1000) - 1]
        # bin lower bound: est <= exact, rel err < 2^(1-5) = 6.25%
        assert est[qp] <= exact
        assert (exact - est[qp]) / exact < 0.0625 + 1e-9, (
            qp, est[qp], exact,
        )


def test_hdr_merge_equals_whole_and_bounded_bins(spark):
    vals = list(range(1, 5001))
    df = spark.createDataFrame(
        [("k", v) for v in vals], "g string, v long"
    )
    whole = sk.hdr_partials(df, ["g"], "v", sub_bits=4)
    h1 = sk.hdr_partials(
        df.filter(F.col("v") % 2 == 0), ["g"], "v", sub_bits=4
    )
    h2 = sk.hdr_partials(
        df.filter(F.col("v") % 2 == 1), ["g"], "v", sub_bits=4
    )
    merged = sk.hdr_merge(h1.unionByName(h2), ["g"])
    assert {tuple(r) for r in whole.collect()} == {
        tuple(r) for r in merged.collect()
    }
    # bin count stays tiny vs 5000 values
    assert whole.count() < 200


def test_hdr_duckdb_mirror(spark):
    df = spark.createDataFrame(
        [("k", v * 37 + 1) for v in range(3000)], "g string, v long"
    )
    got_spark = {
        tuple(r)
        for r in sk.hdr_partials(df, ["g"], "v", sub_bits=5).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    got_duck = {
        tuple(r)
        for r in con.sql(
            """
            SELECT g,
              CAST(greatest(length(bin(v)) - 5, 0) AS INT) AS b,
              v >> CAST(greatest(length(bin(v)) - 5, 0) AS INT)
                AS sub,
              COUNT(*) AS n
            FROM t GROUP BY 1, 2, 3
            """
        ).fetchall()
    }
    assert got_spark == got_duck


# ----------------------------------------- epoch rebuild (r11)


def test_epoch_rebuild_hll_equals_scratch(spark, tmp_path):
    """The delete path for non-invertible sketches: a Delta CDF batch
    poisons two of four epochs; sketch_epoch_rebuild rescans ONLY the
    touched epochs and the refreshed store equals a from-scratch
    hll_partials over the final table — while untouched epochs'
    partials are reused verbatim."""
    from medallion_delta_lake_spark.sources import delta_log

    p = str(tmp_path / "hll_epochs")
    rows = [(i % 4, f"u{i % 37}", i) for i in range(200)]
    delta_log.write_delta(
        spark,
        spark.createDataFrame(rows, "day int, uid string, k int")
        .coalesce(1),
        p,
    )
    delta_log.set_table_properties(
        p, {"delta.enableChangeDataFeed": "true"}
    )
    v0 = delta_log.resolve_snapshot(p)["version"]
    part = lambda df: sk.hll_partials(df, ["day"], "uid", p=6)  # noqa: E731
    store = part(delta_log.read_delta(spark, p))
    store_rows = store.collect()  # materialize the "stored" partials
    stored = spark.createDataFrame(store_rows, store.schema)

    # churn epochs 1 and 3 only: delete some day-1 rows, rewrite day-3
    delta_log.delete_delta_log(
        spark, p, [("day", "=", 1), ("k", "<", 100)]
    )
    delta_log.update_delta_log(
        spark, p, [("day", "=", 3)], {"uid": "concat(uid, '_z')"}
    )
    changes = delta_log.table_changes(spark, p, v0 + 1)
    assert {r.day for r in changes.select("day").distinct().collect()} == {1, 3}

    cur = delta_log.read_delta(spark, p)
    refreshed = sk.sketch_epoch_rebuild(cur, stored, changes, "day", part)
    scratch = part(cur)
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    # untouched epochs (0, 2) are the stored rows verbatim
    kept = {tuple(r) for r in refreshed.filter("day in (0, 2)").collect()}
    assert kept == {t for t in map(tuple, store_rows) if t[0] in (0, 2)}


def test_epoch_rebuild_kmv_equals_scratch(spark):
    """Same law for KMV, with a fully-deleted epoch (its partials must
    vanish from the store) and a brand-new epoch arriving as inserts
    (it must appear) — no Delta plumbing, plain frames."""
    base = spark.createDataFrame(
        [(d, f"v{d}_{i}") for d in range(3) for i in range(50)],
        "day int, v string",
    )
    part = lambda df: sk.kmv_partials(df, ["day"], "v", k=16)  # noqa: E731
    stored = part(base)
    # final state: day 0 unchanged, day 1 gone, day 3 new
    cur = base.filter("day != 1").unionByName(
        spark.createDataFrame(
            [(3, f"n{i}") for i in range(30)], "day int, v string"
        )
    )
    changes = spark.createDataFrame(
        [(1, "dropped"), (3, "added")], "day int, note string"
    )
    refreshed = sk.sketch_epoch_rebuild(cur, stored, changes, "day", part)
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, part(cur).collect())
    )
    days = {r.day for r in refreshed.select("day").distinct().collect()}
    assert days == {0, 2, 3}
