"""JL random projection (similarity.project_embeddings): determinism
across partitionings, the distance-preservation guarantee on real
embeddings, and downstream ANN usefulness of the compressed space."""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(120)
        .cache()
    )


def test_projection_shape_and_determinism(spark, emb):
    out = sim.project_embeddings(emb, out_dims=16)
    rows = {r["vec_id"]: r["proj"] for r in out.collect()}
    assert all(len(v) == 16 for v in rows.values())
    # repartitioning must not change a per-row expression's values
    out2 = sim.project_embeddings(emb.repartition(7), out_dims=16)
    rows2 = {r["vec_id"]: r["proj"] for r in out2.collect()}
    assert rows == rows2  # bit-for-bit


def test_pairwise_cosine_roughly_preserved(spark, emb):
    """JL: with out_dims=32 the projected cosine tracks the true
    cosine to within a few times 1/sqrt(out_dims) for most pairs —
    check the mean absolute deviation over all pairs of a sample."""
    import numpy as np

    pdf = emb.limit(40).toPandas()
    proj = {
        r["vec_id"]: np.array(r["proj"])
        for r in sim.project_embeddings(emb.limit(40), out_dims=32)
        .collect()
    }
    full = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for _, r in pdf.iterrows()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    ids = sorted(full)
    devs = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            devs.append(
                abs(cos(full[a], full[b]) - cos(proj[a], proj[b]))
            )
    mad = sum(devs) / len(devs)
    assert mad < 3.0 / math.sqrt(32), mad  # ~0.53 bound, expect ≪


def test_projected_space_ranks_neighbors_usefully(spark, emb):
    """Top-1 neighbor by projected cosine should usually be a top-5
    neighbor by true cosine — the compressed first-pass contract."""
    import numpy as np

    n = 40
    proj = {
        r["vec_id"]: np.array(r["proj"])
        for r in sim.project_embeddings(emb.limit(n), out_dims=32)
        .collect()
    }
    full = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in emb.limit(n).collect()
    }

    def ranks(space, q):
        def cos(a, b):
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            return float(a @ b / (na * nb)) if na and nb else 0.0

        return sorted(
            (i for i in space if i != q),
            key=lambda i: -cos(space[q], space[i]),
        )

    hit = 0
    ids = sorted(full)
    for q in ids:
        p1 = ranks(proj, q)[0]
        if p1 in ranks(full, q)[:5]:
            hit += 1
    assert hit / len(ids) >= 0.5, hit / len(ids)
