"""Incremental near-dup dedup against the persistent signature store:
batch 2 must recognize batch-1 documents without re-hashing them, and
the store must grow by exactly the surviving docs' signatures."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import dedup
from medallion_delta_lake_spark.plans.queries_text import _dup_corpus
from tests.conftest import SF_SMOKE


def test_incremental_neardup_flags_history_duplicates(spark, tmp_path):
    store = str(tmp_path / "sig_store")
    base = _dup_corpus(spark, SF_SMOKE).filter(F.col("doc_id") < 100000)

    # batch 1: all-original corpus -> nothing flagged, store created
    out1 = dedup.incremental_neardup(spark, base, store, fan_out=8)
    assert out1.filter(F.col("dup_of").isNotNull()).count() == 0
    store_rows_1 = spark.read.parquet(store).count()
    assert store_rows_1 == base.count() * 4  # 4 bands per doc

    # batch 2: exact copies of some batch-1 docs (new ids) + genuinely
    # new docs (perturbed text)
    copies = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    fresh = base.filter(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.concat(F.lit("totally different prefix content "), "text").alias("text"),
    )
    batch2 = copies.unionByName(fresh)
    out2 = dedup.incremental_neardup(spark, batch2, store, fan_out=8)
    flagged = {r.doc_id: r.dup_of for r in out2.filter(F.col("dup_of").isNotNull()).collect()}

    # every exact copy is flagged; dup_of is the MINIMUM band-sharing
    # history id, which is ≤ its own original (corpus docs that are
    # near-dups of each other can alias to an even smaller id)
    for r in copies.collect():
        orig = r.doc_id - 500000
        assert r.doc_id in flagged
        assert flagged[r.doc_id] <= orig
        assert flagged[r.doc_id] < 500000  # always a history doc

    # the store grew by 4 rows per surviving (non-dup) doc only
    n_flagged = len(flagged)
    store_rows_2 = spark.read.parquet(store).count()
    assert store_rows_2 == store_rows_1 + (batch2.count() - n_flagged) * 4

    # idempotent-ish third pass: resubmitting batch-2 originals flags
    # them against whatever their first submission stored
    out3 = dedup.incremental_neardup(
        spark,
        fresh.select((F.col("doc_id") + 1000).alias("doc_id"), "text"),
        store,
        fan_out=8,
    )
    assert out3.filter(F.col("dup_of").isNull()).count() == 0


def test_incremental_emb_neardup_flags_history_vectors(spark, tmp_path):
    from medallion_delta_lake_spark.operators import similarity as sim

    store = str(tmp_path / "vec_store")
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", sim.as_double("embedding").alias("embedding")
    )
    out1 = sim.incremental_emb_neardup(spark, e, store)
    assert out1.filter(F.col("dup_of").isNotNull()).count() == 0

    # batch 2: scaled copies (cosine exactly 1) + genuinely new
    # orthogonal-ish vectors (negated → cosine -1 to their original)
    copies = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 3.0).alias("embedding"),
    )
    fresh = e.filter(F.col("vec_id") % 10 == 5).select(
        (F.col("vec_id") + 20000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    out2 = sim.incremental_emb_neardup(
        spark, copies.unionByName(fresh), store
    )
    flagged = {
        r.vec_id: r.dup_of
        for r in out2.filter(F.col("dup_of").isNotNull()).collect()
    }
    for r in copies.select("vec_id").collect():
        assert r.vec_id in flagged
        assert flagged[r.vec_id] < 10000
    # negated vectors are cosine -1 to history: never flagged
    assert all(v < 20000 for v in flagged)


def test_incremental_neardup_within_batch(spark, tmp_path):
    # standalone mode: duplicates arriving in the SAME batch alias to
    # the minimum batch id sharing a band; only group minima reach the
    # store (default history-only mode keeps both — contract-tested
    # above by batch 1 flagging nothing)
    store = str(tmp_path / "sig_store_wb")
    base = _dup_corpus(spark, SF_SMOKE).filter(
        (F.col("doc_id") < 100000) & (F.col("doc_id") % 7 == 1)
    )
    copies = base.select((F.col("doc_id") + 500000).alias("doc_id"), "text")
    batch = base.unionByName(copies)
    out = dedup.incremental_neardup(
        spark, batch, store, fan_out=8, within_batch=True
    )
    flagged = {
        r.doc_id: r.dup_of
        for r in out.filter(F.col("dup_of").isNotNull()).collect()
    }
    for r in copies.collect():
        assert r.doc_id in flagged
        assert flagged[r.doc_id] <= r.doc_id - 500000
    # survivors only in the store: 4 band rows per non-flagged doc
    n_survivors = out.filter(F.col("dup_of").isNull()).count()
    assert spark.read.parquet(store).count() == n_survivors * 4
    # day 2: resubmitting the originals under new ids hits history
    day2 = base.select((F.col("doc_id") + 900000).alias("doc_id"), "text")
    out2 = dedup.incremental_neardup(
        spark, day2, store, fan_out=8, within_batch=True
    )
    assert out2.filter(F.col("dup_of").isNull()).count() == 0


def test_incremental_emb_neardup_within_batch(spark, tmp_path):
    from medallion_delta_lake_spark.operators import similarity as sim

    store = str(tmp_path / "vec_store_wb")
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", sim.as_double("embedding").alias("embedding")
    ).filter(F.col("vec_id") % 10 == 0)
    copies = e.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    out = sim.incremental_emb_neardup(
        spark, e.unionByName(copies), store, within_batch=True
    )
    flagged = {
        r.vec_id: r.dup_of
        for r in out.filter(F.col("dup_of").isNotNull()).collect()
    }
    for r in copies.select("vec_id").collect():
        assert r.vec_id in flagged
        assert flagged[r.vec_id] == r.vec_id - 10000
    assert out.filter(F.col("dup_of").isNull()).count() == e.count()


def test_incremental_neardup_batch_id_replay_idempotent(spark, tmp_path):
    """The at-least-once replay contract (ADVICE r5): with batch_id
    set, a replay whose first attempt already appended its signatures
    to the store must NOT label the batch's docs as duplicates of
    themselves, and must not double-write the store — the failure mode
    that permanently dropped documents under the append-based sink."""
    store = str(tmp_path / "sig_store_replay")
    base = _dup_corpus(spark, SF_SMOKE).filter(F.col("doc_id") < 100000)

    out1 = dedup.incremental_neardup(
        spark, base, store, fan_out=8, within_batch=True, batch_id=0
    )
    labels1 = {r.doc_id: r.dup_of for r in out1.collect()}
    rows1 = spark.read.parquet(store).count()

    # simulated foreachBatch replay: same batch, same id — the store
    # already holds batch 0's own signatures
    out2 = dedup.incremental_neardup(
        spark, base, store, fan_out=8, within_batch=True, batch_id=0
    )
    labels2 = {r.doc_id: r.dup_of for r in out2.collect()}
    assert labels2 == labels1  # deterministic, no self-duplicate drops
    assert spark.read.parquet(store).count() == rows1  # overwrite, not append

    # a LATER batch still sees batch 0 as history: re-arrivals flagged
    rearrival = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    out3 = dedup.incremental_neardup(
        spark, rearrival, store, fan_out=8, within_batch=True, batch_id=1
    )
    assert out3.filter(F.col("dup_of").isNull()).count() == 0
