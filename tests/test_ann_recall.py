"""ANN recall@k against the exact brute-force ground truth.

The embeddings table is ~uniform random vectors (hardest case for LSH:
true neighbors are barely closer than random points), so absolute
recall is modest by construction; what the tests pin is (a) the
measured floor of each strategy on the fixed deterministic corpus and
(b) the multi-probe ordering property — probing the n_planes
Hamming-1 buckets must strictly dominate single-probe recall.

Everything here is deterministic: hyperplanes are fixed integer
weights, centroids are the first 16 ids, and the corpus is the same
500 vectors at every sf.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import similarity as sim
from tests.conftest import SF_SMOKE

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

K = 10
N_QUERIES = 20


def _pairs(df) -> set[tuple]:
    return {(r.query_id, r.vec_id) for r in df.collect()}


def _corpus(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    return e.filter(F.col("vec_id") < N_QUERIES), e


def test_ann_lsh_multi_probe_dominates_single(spark):
    q, e = _corpus(spark)
    bf = _pairs(sim.brute_force_topk(q, e, k=K))
    single = _pairs(sim.ann_topk(q, e, k=K, n_planes=6, dims=64))
    multi = _pairs(
        sim.ann_topk(q, e, k=K, n_planes=6, dims=64, multi_probe=True)
    )
    r_single = len(bf & single) / len(bf)
    r_multi = len(bf & multi) / len(bf)
    # measured on this corpus: single 0.18, multi 0.395
    assert r_single >= 0.10
    assert r_multi >= 0.30
    assert r_multi > r_single


def test_ann_ivf_recall_floor(spark):
    q, e = _corpus(spark)
    bf = _pairs(sim.brute_force_topk(q, e, k=K))
    ivf = _pairs(sim.ivf_topk(q, e, k=K, n_centroids=16))
    r_ivf = len(bf & ivf) / len(bf)
    assert r_ivf >= 0.60  # measured 0.71


def test_ann_results_subset_of_corpus_and_exact_scores(spark):
    # ANN must never fabricate scores: every (query, candidate, cosine)
    # it returns has to match the brute-force score exactly
    q, e = _corpus(spark)
    bf = {
        (r.query_id, r.vec_id): r.cosine
        for r in sim.brute_force_topk(q, e, k=500).collect()
    }
    ann = sim.ann_topk(q, e, k=K, n_planes=6, dims=64, multi_probe=True)
    for r in ann.collect():
        assert bf[(r.query_id, r.vec_id)] == r.cosine


def test_kmeans_centroids_reduce_quantization_error(spark):
    # the Lloyd's-iteration guarantee: mean squared distance to the
    # assigned centroid strictly improves over the deterministic
    # first-k init. (On this uniform-random corpus k-means BALANCES the
    # inverted lists — per-probe cost drops, but nprobe=1 recall can be
    # lower than with the init's lopsided lists; the operator docstring
    # documents that tradeoff. Quantization error is the invariant.)
    from pyspark.sql import Window

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")

    def qerr(centroids):
        a = sim.ivf_assign(e, centroids)
        cv = centroids.select(F.col("cid").alias("_c"), "cv")
        j = a.join(cv, F.col("cid") == F.col("_c"))
        d2 = F.aggregate(
            F.zip_with(
                sim.as_double("embedding"),
                sim.as_double("cv"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        return j.agg(F.avg(d2)).first()[0]

    w = Window.orderBy(F.col("vec_id").asc())
    init = (
        e.orderBy("vec_id")
        .limit(16)
        .select(
            (F.row_number().over(w) - 1).alias("cid"),
            F.col("embedding").alias("cv"),
        )
    )
    km = sim.kmeans_centroids(e, k=16, max_iter=5)
    assert km.count() == 16  # empty clusters survive; k is stable
    e_init, e_km = qerr(init), qerr(km)
    # measured: 1.51 -> 0.885 on this corpus
    assert e_km < 0.75 * e_init

    # determinism: a re-run produces identical centroids
    km2 = sim.kmeans_centroids(e, k=16, max_iter=5)
    a = sorted((r.cid, tuple(r.cv)) for r in km.collect())
    b = sorted((r.cid, tuple(r.cv)) for r in km2.collect())
    assert a == b


def test_self_topk_hot_bucket_guard_bounds_candidates(spark):
    """Adversarial corpus: every vector identical → one bucket that no
    plane family can split. The guard must (a) hard-bound candidate
    volume at max_bucket·N instead of N², (b) still return k neighbors
    for EVERY query, with exact cosine scores."""
    n, cap, dims = 120, 16, 8
    rows = [(i, [1.0] * dims) for i in range(n)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cands = sim._self_candidates(
        e, n_planes=4, dims=dims, id_col="vec_id", vec_col="embedding",
        max_bucket=cap, refine_planes=4,
    )
    n_cands = cands.count()
    assert n_cands <= cap * n  # the bound the guard exists for
    assert n_cands >= (cap - 1) * n  # and it isn't vacuously empty
    out = sim.ann_self_topk(
        e, k=3, n_planes=4, dims=dims, max_bucket=cap, refine_planes=4
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
        assert abs(r.cosine - 1.0) < 1e-12  # identical vectors
    assert len(per_q) == n  # every query keeps neighbors
    assert all(len(v) == 3 for v in per_q.values())

    # unguarded (max_bucket=None) volume really is N·(N-1) — the guard
    # is a strict improvement, not a different algorithm
    unguarded = sim._self_candidates(
        e, 4, dims, "vec_id", "embedding", None, 0
    )
    assert unguarded.count() == n * (n - 1)


def test_self_topk_refine_splits_diverse_hot_bucket(spark):
    """A hot bucket of DIVERSE vectors (small n_planes forces the
    collision) must be re-split by the secondary plane family rather
    than truncated: with the guard on, recall against brute force on
    the real corpus stays within the unguarded band."""
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    bf = _pairs(sim.brute_force_topk(q, e, k=K))
    # n_planes=2 → ≤4 primary buckets over 500 vectors: all hot at cap 64
    base = sim.ann_self_topk(
        e, k=K, n_planes=2, dims=64, max_bucket=None
    )
    guarded = sim.ann_self_topk(
        e, k=K, n_planes=2, dims=64, max_bucket=64, refine_planes=6
    )
    base_p = {
        (r.query_id, r.vec_id)
        for r in base.filter(F.col("query_id") < N_QUERIES).collect()
    }
    guard_p = {
        (r.query_id, r.vec_id)
        for r in guarded.filter(F.col("query_id") < N_QUERIES).collect()
    }
    r_base = len(bf & base_p) / len(bf)
    r_guard = len(bf & guard_p) / len(bf)
    # On THIS corpus (uniform random — the documented worst case for
    # LSH) recall scales with the candidate-pool fraction: cap 64 on
    # ~125-row buckets halves the pool, so the floor is
    # pool-proportional, not free. Structured corpora do better — the
    # secondary planes keep genuinely-near vectors together, while
    # here every split is effectively random. Measured: base 0.325,
    # guarded 0.145 (ratio 0.45 ≈ pool fraction 0.5).
    assert r_guard >= r_base * 0.35, (r_base, r_guard)
    assert r_guard >= 0.10, (r_base, r_guard)

    # defaults leave the registered-query path bit-identical: no
    # bucket in the 500-vector corpus exceeds the 1024 default cap
    dflt = sim.ann_self_topk(e, k=3, n_planes=6, dims=64)
    off = sim.ann_self_topk(e, k=3, n_planes=6, dims=64, max_bucket=None)
    assert {
        (r.query_id, r.vec_id, r.cosine, r.rank) for r in dflt.collect()
    } == {
        (r.query_id, r.vec_id, r.cosine, r.rank) for r in off.collect()
    }


def test_ivf_nprobe_raises_recall_monotonically(spark):
    q, e = _corpus(spark)
    bf = _pairs(sim.brute_force_topk(q, e, k=K))
    r = {}
    for np_ in (1, 2, 4):
        got = _pairs(sim.ivf_topk(q, e, k=K, n_centroids=16, nprobe=np_))
        r[np_] = len(bf & got) / len(bf)
    assert r[1] <= r[2] <= r[4]
    # measured curve on this corpus: 0.77 / 0.80 / 0.85 (nprobe=8: 0.935)
    assert r[2] >= 0.78
    assert r[4] >= 0.83
    # nprobe=1 path must be unchanged by the refactor
    assert r[1] >= 0.60


def test_brute_force_topk_size_guard(spark):
    """The query side is broadcast and multiplies the corpus scan, so
    an oversized query set must raise (pointing at the ANN paths)
    instead of silently launching a |Q|x|C| cross join."""
    import pytest
    from pyspark.sql import functions as F

    e = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=7) for _ in range(4)]).alias("embedding"),
    )
    with pytest.raises(ValueError, match="ann_topk"):
        sim.brute_force_topk(e, e, k=3, max_query_rows=10)
    # within the cap: runs; None disables the guard entirely
    assert sim.brute_force_topk(e, e, k=3, max_query_rows=50).count() > 0
    assert sim.brute_force_topk(e, e, k=3, max_query_rows=None).count() > 0
