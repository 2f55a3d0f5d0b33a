"""Connected-components cluster assignment vs a union-find reference."""

from __future__ import annotations

from medallion_delta_lake_spark.operators import dedup
from medallion_delta_lake_spark.plans.queries_text import _dup_corpus
from tests.conftest import SF_SMOKE

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def _union_find(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_clusters_match_union_find(spark):
    corpus = _dup_corpus(spark, SF_SMOKE)
    pairs_df = dedup.minhash_lsh_pairs(corpus, n=3, threshold=0.5)
    pairs = [(r.id_a, r.id_b) for r in pairs_df.collect()]
    ids = [r.doc_id for r in corpus.select("doc_id").collect()]

    got = {
        r.doc_id: r.cluster
        for r in dedup.neardup_clusters(
            corpus.select("doc_id"), pairs_df
        ).collect()
    }
    expected = _union_find(ids, pairs)
    assert got == expected
    # planted exact copies must land in their original's cluster
    assert all(got[v + 100000] == got[v] for v in ids if v % 7 == 0 and v < 100000)


def test_containment_catches_doc_inside_doc_that_jaccard_misses(spark):
    """A short doc concatenated into a much larger one: containment
    scores 1.0 (subset), Jaccard stays far below any useful threshold
    (union dominated by the big doc)."""
    from medallion_delta_lake_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i} item{i} token{i}" for i in range(80))
    big = filler + " " + small
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "completely unrelated text here")],
        "doc_id long, text string",
    )
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in dd.containment_pairs(df, threshold=0.8).collect()
    }
    jacc = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    assert cont[(1, 2)] == 1.0  # small ⊂ big
    assert jacc[(1, 2)] < 0.2  # symmetric Jaccard can't see it
    assert (1, 3) not in cont and (2, 3) not in cont


def test_max_df_truncates_boilerplate_postings(spark):
    """The boilerplate cap: docs that share ONLY a high-document-
    frequency shingle (a common header) must not pair up when the
    shingle's posting list exceeds max_df — that truncation is what
    keeps pair generation linear at corpus scale. Docs sharing rarer
    shingles still pair, and the exact score is computed over the
    FULL sets (the cap only gates candidate generation)."""
    from pyspark.sql import functions as F  # noqa: F401

    header = "standard legal disclaimer header common to every page"
    rows = [
        (i, f"{header} unique body {i} " + " ".join(
            f"tok{i}_{j}" for j in range(10)
        ))
        for i in range(12)
    ]
    # two genuine near-dups sharing rare shingles beyond the header
    rows.append((100, "a very specific rare sentence about spark plans"))
    rows.append((101, "a very specific rare sentence about spark plans too"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # header shingles have df=12 > max_df=5 → boilerplate-only pairs gone
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            df, threshold=0.0, max_df=5
        ).collect()
    }
    assert (100, 101) in capped
    assert not any(a < 100 and b < 100 for a, b in capped)

    # uncapped: the 12 header-sharers all pair with each other
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            df, threshold=0.0, max_df=None
        ).collect()
    }
    assert sum(1 for a, b in uncapped if a < 100 and b < 100) == 12 * 11 // 2
    # containment: same truncation contract
    cont = {
        (r.id_a, r.id_b)
        for r in dedup.containment_pairs(
            df, threshold=0.0, max_df=5
        ).collect()
    }
    assert not any(a < 100 and b < 100 for a, b in cont)


def test_star_contraction_matches_union_find(spark):
    corpus = _dup_corpus(spark, SF_SMOKE)
    pairs_df = dedup.minhash_lsh_pairs(corpus, n=3, threshold=0.5)
    pairs = [(r.id_a, r.id_b) for r in pairs_df.collect()]
    ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    got = {
        r.doc_id: r.cluster
        for r in dedup.neardup_clusters_star(
            corpus.select("doc_id"), pairs_df
        ).collect()
    }
    assert got == _union_find(ids, pairs)


def test_star_contraction_pathological_chain(spark):
    """A 512-node path graph: diameter 511, so min-label propagation
    at its default max_iter=20 must FAIL LOUDLY (never return wrong
    labels), while star contraction converges in O(log n) rounds and
    labels every node with the chain head (VERDICT r7 #7)."""
    import pytest

    n = 512
    ids = spark.range(n).selectExpr("id AS doc_id")
    chain = spark.range(n - 1).selectExpr(
        "id AS id_a", "id + 1 AS id_b"
    )
    got = {
        r.doc_id: r.cluster
        for r in dedup.neardup_clusters_star(ids, chain).collect()
    }
    assert got == {i: 0 for i in range(n)}

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.neardup_clusters(ids, chain, max_iter=5)


def test_star_contraction_isolated_and_multi_component(spark):
    ids = spark.range(10).selectExpr("id AS doc_id")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 7)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.cluster
        for r in dedup.neardup_clusters_star(ids, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7, 8: 7, 9: 9}
