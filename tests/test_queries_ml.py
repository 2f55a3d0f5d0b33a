"""Oracle-parity tests for the similarity / embedding-dedup surface
(queries_ml.py), run at sf0.001."""

from __future__ import annotations

import pytest

from medallion_delta_lake_spark.plans import queries_ml  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

ML_IDS = sorted(
    n
    for n in QUERIES
    if n in ORACLES and n.startswith(("sim-", "dedup-embedding", "vector-"))
)


@pytest.mark.parametrize("name", ML_IDS)
def test_ml_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


def test_neardup_finds_planted_duplicates(spark):
    from medallion_delta_lake_spark.plans.queries_ml import _emb_dup_corpus
    from medallion_delta_lake_spark.operators import similarity as sim

    corpus = _emb_dup_corpus(spark, SF_SMOKE)
    pairs = sim.neardup_pairs(corpus, threshold=0.9, n_planes=6).collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    # every exact copy (vec_id+10000) must pair with its original:
    # identical vectors share every LSH bucket, so recall is 1.0 there
    originals = {r.vec_id for r in corpus.collect() if r.vec_id < 10000}
    expected = {(v, v + 10000) for v in originals if v % 10 == 0}
    assert expected <= ids, f"missing exact-copy pairs: {expected - ids}"


def test_pq_codes_centroids_self_code(spark):
    """A codebook vector must encode to itself in every subspace with
    zero reconstruction distance; all codes lie in [0, k)."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators import similarity as sim
    from medallion_delta_lake_spark.plans.registry import table
    from tests.conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")
    out = sim.pq_codes(emb, dims=64, m=4, k=8).cache()
    selfrows = out.filter(F.col("vec_id") < 8)
    assert selfrows.count() == 8 * 4
    assert selfrows.filter(
        (F.col("code") != F.col("vec_id")) | (F.col("dist") != 0.0)
    ).count() == 0
    assert out.filter(
        (F.col("code") < 0) | (F.col("code") >= 8)
    ).count() == 0
    # every vector gets exactly m codes
    n_vec = emb.count()
    assert out.count() == n_vec * 4
    out.unpersist()


def test_pq_adc_topk_self_rank_and_recall(spark):
    """ADC sanity: each query (a codebook vector) has ADC distance 0 to
    itself → rank 1; and ADC top-5 overlaps the exact-L2 top-5
    meaningfully (it is an approximation, not a reshuffle)."""
    import numpy as np
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators import similarity as sim
    from medallion_delta_lake_spark.plans.registry import table
    from tests.conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")
    out = sim.pq_adc_topk(emb, dims=64, m=4, k_cent=8, n_queries=5, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(5))
    for q, rs in by_q.items():
        top = min(rs, key=lambda r: r.rank)
        assert top.vec_id == q and top.adc_dist == 0.0  # self at rank 1

    # recall vs exact squared-L2 top-5 (same query set)
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    hits = total = 0
    for q in range(5):
        d = {
            i: float(((vecs[q] - v) ** 2).sum()) for i, v in vecs.items()
        }
        exact = {i for i, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:5]}
        approx = {r.vec_id for r in by_q[q]}
        hits += len(exact & approx)
        total += 5
    assert hits / total >= 0.3  # coarse 8-centroid codebook, small k
