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
