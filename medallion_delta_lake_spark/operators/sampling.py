"""Deterministic sampling operators for training-data curation
(SURVEY.md §2.11 extension surface — no reference counterpart).

``df.sample()``/``sampleBy()`` draw from an engine-specific RNG — the
result is irreproducible across engines (and across Spark partition
layouts). These operators sample by PORTABLE HASH instead: a row is
kept iff ``h64(salt || id) % D < rate·D``. Same row set on every
engine, every partitioning, every run — which is what a training-data
pipeline needs for reproducible mixtures (and what makes the DuckDB
oracle exact). Selection is a pure per-row codegen predicate: zero
shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.hashing import h64

_DENOM = 10_000  # rate resolution 0.01%


def _keep_cond(id_col: str, rate: float, salt: str) -> Column:
    ticket = h64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return F.pmod(ticket, F.lit(_DENOM)) < int(round(rate * _DENOM))


def sample_hash(
    df: DataFrame, id_col: str, rate: float, salt: str = "s0"
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by id hash. Changing
    ``salt`` draws an independent sample (the re-roll knob)."""
    return df.filter(_keep_cond(id_col, rate, salt))


def sample_stratified_hash(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 100% of wiki, 10% of crawl). ``rates`` maps stratum
    value → keep rate; unlisted strata get ``default_rate``. One CASE
    expression, no shuffle, prunes at the scan when a stratum's rate
    is 0 and the column is a partition key."""
    ticket = F.pmod(
        h64(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(_DENOM),
    )
    thresh = F.lit(int(round(default_rate * _DENOM)))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, int(round(rate * _DENOM))
        ).otherwise(thresh)
    return df.filter(ticket < thresh)


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shuf0",
) -> DataFrame:
    """Deterministic global training-order shuffle + shard assignment:
    the step that turns a curated corpus into the randomized shards a
    data loader streams. Each row gets

    - ``shard``     = h64(salt || id) mod n_shards  (hash-balanced)
    - ``shard_pos`` = rank of the row's ticket within its shard

    so reading shards 0..n-1 sequentially visits documents in a
    reproducible pseudo-random permutation; changing ``salt`` draws an
    independent epoch order.

    Scale shape: the permutation is decided entirely by the 8-byte
    ticket — ``shard_pos`` is ONE window over the shard key ordered by
    (ticket, id), i.e. a single shuffle of (id, ticket) pairs, ~16
    bytes/row at 100 TB; document text never sorts. Production then
    writes ``partitionBy(shard)`` so each output file is one shard,
    or joins the (id, shard, shard_pos) spine back to the payload —
    an id-keyed join, broadcast-free but narrow.
    """
    from pyspark.sql import Window as W

    ticket = h64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = W.partitionBy("shard").orderBy("ticket", id_col)
    return (
        df.withColumn("ticket", ticket)
        .withColumn("shard", F.pmod(F.col("ticket"), F.lit(n_shards)))
        .withColumn("shard_pos", F.row_number().over(w))
        .drop("ticket")
    )


def assign_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float],
    salt: str = "split0",
) -> DataFrame:
    """Deterministic train/holdout split assignment: adds a ``split``
    column from cumulative portable-hash thresholds (e.g.
    ``{"train": .98, "val": .01, "test": .01}``; insertion order fixes
    the threshold order). A document's split is a pure function of
    (salt, id) — stable across reprocessing runs, partition layouts,
    and engines — which is what prevents silent train/eval leakage
    when the corpus is regenerated. Pure per-row codegen predicate:
    zero shuffle, pushdown-friendly.
    """
    ticket = F.pmod(
        h64(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(_DENOM),
    )
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cond = ticket < int(round(acc * _DENOM))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(
        "split", expr.otherwise(F.lit(None).cast("string"))
    )


def mixture_token_budget(
    df: DataFrame,
    text_col: str = "text",
    strata_col: str = "source",
) -> DataFrame:
    """Token-budget mixture planning: per-stratum total token counts
    plus the deterministic keep rate that equalizes every stratum to
    the smallest stratum's token budget (the planning step before
    :func:`sample_stratified_hash` executes the mixture).

    Returns (stratum, total_tokens, keep_rate) with
    ``keep_rate = min_stratum_tokens / stratum_tokens`` — int/int
    double division, engine-exact for the oracle.

    Scale shape: ONE corpus scan — a grouped aggregate with map-side
    combine (token counting is per-row codegen — no shuffle of text);
    the global minimum is an empty-partition window over the tiny
    per-stratum result (a handful of rows on one partition — size is
    stratum count, independent of corpus size). A scalar-subquery
    cross join would re-derive the totals subtree and scan the corpus
    twice; don't "simplify" back to it."""
    from pyspark.sql import Window

    from medallion_delta_lake_spark.functions.texts import tokenize

    totals = df.groupBy(strata_col).agg(
        F.sum(F.size(tokenize(text_col))).alias("total_tokens")
    )
    target = F.min("total_tokens").over(Window.partitionBy())
    return totals.select(
        F.col(strata_col),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        (
            target.cast("double") / F.col("total_tokens").cast("double")
        ).alias("keep_rate"),
    )


def sample_by_weight(
    df: DataFrame,
    id_col: str,
    weight: Column,
    salt: str = "",
) -> DataFrame:
    """Importance sampling with a PER-ROW keep probability: keep a row
    iff ``h64(salt || id) % D < floor(weight · D)`` where ``weight``
    is any deterministic [0, 1] expression (typically a quality score)
    and D is the 10⁴ rate resolution. The high-weight rows survive at
    their weight's rate, reproducibly — the quality-weighted corpus
    downsampling step of a training mixture, without RNG state.

    Same purity as the other samplers: one codegen predicate, zero
    shuffle, engine-exact (floor of a double is IEEE-deterministic
    when ``weight`` derives from integral columns)."""
    ticket = (
        h64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
        % _DENOM
    )
    return df.filter(ticket < F.floor(weight * F.lit(float(_DENOM))))


def temperature_mixture_rates(
    df: DataFrame,
    strata_col: str,
) -> DataFrame:
    """Temperature-scaled mixture rates (T = 0.5): per-stratum keep
    probability ∝ √n_s / n_s, scaled so the smallest stratum keeps
    everything — the multilingual-corpus rebalancing rule (big sources
    are downsampled toward the √-law share; exponent fixed at 0.5
    because sqrt is correctly rounded IEEE, unlike pow, keeping the
    oracle exact). Returns (stratum, n, keep_rate)."""
    counts = df.groupBy(F.col(strata_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    min_n = counts.agg(F.min("n").alias("_min_n"))
    return counts.crossJoin(F.broadcast(min_n)).select(
        strata_col,
        "n",
        F.least(
            F.lit(1.0),
            F.sqrt(F.col("n").cast("double") * F.col("_min_n").cast("double"))
            / F.col("n").cast("double"),
        ).alias("keep_rate"),
    )


def sample_temperature_mixture(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    salt: str = "",
) -> DataFrame:
    """Apply :func:`temperature_mixture_rates` by portable hash: keep
    a row iff ``h64(salt||id) % D < floor(rate·D)``. The per-stratum
    rate joins in as a broadcast (|strata| rows); selection stays a
    per-row codegen predicate — the raw data never shuffles."""
    rates = temperature_mixture_rates(df, strata_col)
    ticket = (
        h64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
        % _DENOM
    )
    return (
        df.join(F.broadcast(rates.select(strata_col, "keep_rate")), strata_col)
        .filter(ticket < F.floor(F.col("keep_rate") * F.lit(float(_DENOM))))
        .drop("keep_rate")
    )


def mixture_epochs(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    epochs: Mapping[str, float],
    default_epochs: float = 1.0,
    salt: str = "ep0",
) -> DataFrame:
    """Fractional-EPOCH mixture materialization — the upsampling twin
    of :func:`sample_stratified_hash` (which only downsamples): a
    pretraining mixture often specifies "2.5 epochs of wiki, 0.4 of
    crawl", so each row must emit ``floor(e)`` full copies plus one
    more with probability ``frac(e)``. The fractional copy is decided
    by portable hash (``h64(salt||id) % D < frac·D``) — the emitted
    multiset is a pure function of (salt, id), identical on any
    engine/partitioning/rerun, and per-row INDEPENDENT of the integer
    copies (every replica of a kept id is emitted together, which is
    what epoch semantics mean).

    Output: input columns plus ``epoch_idx`` (0-based copy number) —
    downstream shard-shuffling can then disperse the copies. Zero
    shuffle: one CASE for e, one hash predicate, one
    ``explode(sequence)`` — all codegen; rows with 0 copies are
    filtered before the explode."""
    e_expr = F.lit(float(default_epochs))
    for value, e in sorted(epochs.items()):
        e_expr = F.when(
            F.col(strata_col) == value, float(e)
        ).otherwise(e_expr)
    whole = F.floor(e_expr)
    frac = e_expr - whole
    ticket = F.pmod(
        h64(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(_DENOM),
    )
    extra = (ticket < F.floor(frac * F.lit(float(_DENOM)))).cast(
        "bigint"
    )
    n = (whole.cast("bigint") + extra).alias("_n_copies")
    return (
        df.select("*", n)
        .filter(F.col("_n_copies") > 0)
        .select(
            *df.columns,
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.col("_n_copies") - F.lit(1).cast("bigint"),
                )
            ).alias("epoch_idx"),
        )
    )


def balanced_downsample(
    df: DataFrame,
    class_col: str,
    id_col: str,
) -> DataFrame:
    """Class-balancing downsample: keep exactly ``min(class count)``
    rows per class — the label-balancing step before training a
    classifier on skewed data. Selection is DETERMINISTIC: rows rank
    by the portable 60-bit hash of their id (ties by id), so the same
    input always yields the same sample, on any engine, any partition
    layout — no ``rand()`` seed drift, re-runs are reproducible.

    Scale shape: one k-row class-count aggregate (broadcast), one
    shuffle on the class key for the rank window. The window sorts
    each class partition; for extreme single-class skew pre-split by
    a salt and take per-salt quotas (same trick as join-salted-skew).

    Output: the sampled rows ``(id_col, class_col)``.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    w = W.partitionBy(class_col).orderBy(
        h64(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(id_col, class_col).withColumn(
        "_rn", F.row_number().over(w)
    )
    return (
        ranked.crossJoin(F.broadcast(nmin))
        .filter(F.col("_rn") <= F.col("_nmin"))
        .select(id_col, class_col)
    )
