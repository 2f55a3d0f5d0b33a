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


def materialize_training_mix(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    epochs: Mapping[str, float] | None = None,
    default_epochs: float = 1.0,
    n_shards: int = 8,
    seq_tokens: int = 2048,
    salt: str = "mix0",
) -> tuple[DataFrame, DataFrame]:
    """The step AFTER cleaning: turn a curated corpus into the epoch-
    expanded, shuffled, sequence-packed shards a pretraining data
    loader streams. Returns ``(assignment, sequences)``:

    - ``assignment`` — one row per document REPLICA:
      (id, epoch_idx, stratum, n_tokens, shard, shard_pos, seq_id);
    - ``sequences`` — the packing manifest: one row per training
      sequence (shard, seq_id, n_docs, n_tokens, docs — the ordered
      (id, epoch_idx) structs the loader concatenates).

    Composition (all deterministic in (salt, id): identical shards on
    any engine/partitioning/rerun):

    1. :func:`sampling.mixture_epochs` — "2.5 epochs of wiki" becomes
       floor/fractional replicas tagged ``epoch_idx``;
    2. :func:`sampling.shuffle_shards` keyed on (id, epoch_idx) — the
       two copies of a document land in independent positions (an
       epoch-aware permutation, not back-to-back duplicates);
    3. greedy contiguous packing: within each shard, the running token
       count in shuffle order is integer-divided by ``seq_tokens`` —
       one window per shard, the pack-sequences plan.

    Scale shape: token counts ride an (id, ticket, n_tokens) spine —
    text is touched once (tokenize) and never shuffled; every later
    stage moves ≤24-byte rows. Production joins ``assignment`` back
    to the payload by id and writes ``partitionBy(shard)``."""
    from pyspark.sql import Window as W

    from medallion_delta_lake_spark.functions.texts import tokenize

    base = docs.select(
        F.col(id_col),
        F.col(strata_col),
        F.size(tokenize(text_col)).alias("n_tokens"),
    )
    reps = sampling.mixture_epochs(
        base,
        id_col,
        strata_col,
        epochs or {},
        default_epochs=default_epochs,
        salt=f"{salt}-e",
    ).withColumn(
        "_rid",
        F.concat(
            F.col(id_col).cast("string"),
            F.lit("#"),
            F.col("epoch_idx").cast("string"),
        ),
    )
    sharded = sampling.shuffle_shards(reps, "_rid", n_shards, salt=f"{salt}-s")
    w = (
        W.partitionBy("shard")
        .orderBy("shard_pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    assignment = sharded.withColumn(
        "seq_id",
        (
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            / F.lit(seq_tokens)
        ).cast("bigint"),
    ).select(
        id_col,
        "epoch_idx",
        strata_col,
        "n_tokens",
        "shard",
        "shard_pos",
        "seq_id",
    )
    sequences = (
        assignment.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("shard_pos"),
                        F.col(id_col).alias("doc_id"),
                        F.col("epoch_idx"),
                    )
                )
            ).alias("docs"),
        )
    )
    return assignment, sequences
