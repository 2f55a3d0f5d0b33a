"""LLM training-corpus cleaning pipeline.

The composition a pre-training data pipeline runs over a raw document
table, in the canonical order (cheapest filter first, most expensive
pair-generation last, each stage shrinking the next stage's input):

0. mixture sampling — per-source deterministic keep rates (optional)
1. quality gate     — per-row heuristic score (no shuffle)
2. PII scrub        — email / long-number redaction (optional, no shuffle)
3. exact dedup      — content-hash groupBy keeping the minimum id
4. near-dup dedup   — MinHash/LSH pairs → connected components →
                      keep each duplicate cluster's representative
5. stats            — one-row audit of the funnel

Everything is engine operators (operators/text_analysis.py,
operators/dedup.py, operators/sampling.py); at 100 TB each stage is a
linear pass plus bigint-keyed shuffles — raw text never shuffles after
the per-row stages.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import dedup
from medallion_delta_lake_spark.operators import sampling
from medallion_delta_lake_spark.operators import text_analysis as ta
from medallion_delta_lake_spark.operators.caching import cache_scope


def clean_corpus(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: int = 50,
    neardup_threshold: float = 0.5,
    fan_out: int | None = None,
    mixture: Mapping[str, float] | None = None,
    strata_col: str = "source",
    mixture_default_rate: float = 1.0,
    scrub: bool = False,
    decontaminate_against: DataFrame | None = None,
    decontam_ngram: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Returns (surviving documents, one-row funnel stats).

    ``mixture`` (stratum → keep rate) applies deterministic hash
    sampling on ``strata_col`` before anything else (cheapest stage
    first). ``scrub=True`` replaces the text with its PII-scrubbed
    form after the quality gate — before dedup, so redaction cannot
    split duplicate groups. ``decontaminate_against`` (a benchmark/
    eval corpus with the same text column) drops every document
    sharing a word ``decontam_ngram``-gram with it, after the quality
    gate and before dedup — the benchmark gram set broadcasts, so the
    stage costs one pass over the already-thinned corpus.

    Each funnel stage is computed EXACTLY ONCE: the spine frames
    (input, post-quality, post-exact-dedup, final) are persisted
    (MEMORY_AND_DISK, so a 100 TB run spills instead of failing), each
    stage's count scans its own cache rather than recomputing its
    upstream, and the intermediates are released as soon as the final
    frame is materialized. The returned ``final_docs`` stays cached —
    the caller's subsequent write/action reads the cache instead of
    re-running the LSH stage; the caller owns ``unpersist()``."""
    if mixture is not None:
        docs = sampling.sample_stratified_hash(
            docs, id_col, strata_col, mixture,
            default_rate=mixture_default_rate, salt="corpus",
        )
    docs = docs.persist()
    n_in = docs.count()  # materializes the spine's root

    scored = ta.quality_score(docs, text_col, (id_col,))
    keep_q = scored.filter(
        F.col("quality_score") >= min_quality
    ).select(id_col)
    quality_docs = docs.join(keep_q, id_col)
    if scrub:
        keep = [c for c in quality_docs.columns if c != text_col]
        quality_docs = ta.scrub_pii(
            quality_docs, text_col, out_col=text_col, keep_cols=keep
        ).drop("n_emails", "n_numbers", "scrubbed_len")
    quality_docs = quality_docs.persist()
    n_quality = quality_docs.count()  # scans the docs cache once

    if decontaminate_against is not None:
        flags = dedup.decontaminate(
            quality_docs, decontaminate_against, text_col, id_col,
            n=decontam_ngram,
        )
        clean_ids = flags.filter(~F.col("is_contaminated")).select(id_col)
        decontam_docs = quality_docs.join(clean_ids, id_col).persist()
        n_decontam = decontam_docs.count()  # scans the quality cache once
    else:
        decontam_docs = quality_docs
        n_decontam = n_quality

    exact = dedup.exact_dedup_groups(decontam_docs, text_col, id_col)
    exact_docs = decontam_docs.join(
        exact.select(F.col("keep_id").alias(id_col)), id_col
    ).persist()
    n_exact = exact_docs.count()  # scans the decontam/quality cache once

    # operator-internal caches (shingle sets, signatures, edges) serve
    # their self-joins within this block; the scope returns the executor
    # memory on exit without touching caches owned by any other
    # in-flight pipeline — final_docs' own persist() is NOT scope-tracked,
    # so it survives the block for the caller.
    with cache_scope():
        pairs = dedup.minhash_lsh_pairs(
            exact_docs,
            text_col=text_col,
            id_col=id_col,
            threshold=neardup_threshold,
            fan_out=fan_out,
        )
        clusters = dedup.neardup_clusters(
            exact_docs.select(id_col), pairs, id_col=id_col
        )
        reps = clusters.filter(F.col(id_col) == F.col("cluster")).select(
            id_col
        )
        final_docs = exact_docs.join(reps, id_col).persist()
        # materialize INSIDE the scope, while the operator caches are
        # still alive — after this, nothing ever recomputes the funnel
        n_final = final_docs.count()

    # final is materialized; the upstream spine caches are dead weight
    spine = {id(docs): docs, id(quality_docs): quality_docs,
             id(decontam_docs): decontam_docs, id(exact_docs): exact_docs}
    for df in spine.values():
        df.unpersist()

    stats = spark.createDataFrame(
        [(n_in, n_quality, n_decontam, n_exact, n_final)],
        [
            "n_input",
            "n_after_quality",
            "n_after_decontam",
            "n_after_exact_dedup",
            "n_final",
        ],
    )
    return final_docs, stats
