"""Connected-components cluster assignment vs a union-find reference."""

from __future__ import annotations

from medallion_delta_lake_spark.operators import dedup
from medallion_delta_lake_spark.plans.queries_text import _dup_corpus
from tests.conftest import SF_SMOKE


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
