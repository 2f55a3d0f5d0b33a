"""Mergeable cardinality / frequency sketches (SURVEY.md §2.11
extension surface — no reference counterpart; pre-built in r10, the
registered query faces land in r11).

The 100 TB pattern these serve: you cannot afford a global
``COUNT(DISTINCT ...)`` or exact heavy-hitter pass over every
partition of a petabyte table on every question. Instead you compute
a SMALL SKETCH PARTIAL per partition/day/source (one narrow shuffle,
map-side combined), STORE the partials as a table, and answer
questions later by MERGING partials — commutative, associative,
idempotent merges (max for HLL registers, bottom-k for KMV, sum for
Count-Min), so a year of daily partials folds into one estimate
without touching the raw data again.

Engine portability is the same doctrine as the rest of the repo: the
hash is the md5-backed portable ``h64`` (functions/hashing.py), index
/ leading-zero math is integer bit arithmetic (``shiftright``, ``&``,
``length(bin(x))``), and every estimate face is an EXACT integer
quantization via DECIMAL(38,0) division (operators/agg.py:q_div) —
no double ever forms, so a DuckDB oracle reproduces every column
bit-for-bit and the r8/r9 driver-red class (cross-engine libm /
int→double ulp) is excluded by construction.

Sketch choices:
- HyperLogLog (Flajolet et al. 2007): 2^p max-of-leading-zero
  registers; standard error 1.04/sqrt(m). Register table format
  (keys..., reg, r) — the same shape Spark's own HLL++ keeps
  internally, but externalized so it is storable and mergeable as
  DATA.
- KMV / bottom-k (Bar-Yossef et al. 2002): the k smallest distinct
  hash values; unbiased estimate (k-1)·2^60/h_(k); supports
  union/intersection/Jaccard between sketches — the set-overlap
  questions HLL alone cannot answer.
- Count-Min (Cormode & Muthukrishnan 2005): d×w counter matrix,
  point frequency estimate = min over d rows; always an
  OVER-estimate, error ≤ εN with ε = e/w at probability 1−(1/e)^d.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.hashing import (
    h64,
    minhash_params,
    perm_hash,
)
from medallion_delta_lake_spark.operators.agg import q_div

# ------------------------------------------------------------------
# HyperLogLog


def _hll_dims(p: int) -> tuple[int, int, int]:
    """(m, wbits, rho_max) for precision ``p``: m = 2^p registers,
    the remaining wbits = 60 − p hash bits feed the leading-zero
    count, rho ∈ [1, wbits + 1]."""
    if not 4 <= p <= 16:
        raise ValueError(f"HLL precision p={p} outside [4, 16]")
    return 1 << p, 60 - p, 60 - p + 1


def hll_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Per-``keys`` HLL register table over ``value_col``:
    (keys..., reg INT, r INT) with r = max over rows of
    (leading zeros of the hash's top 60−p bits) + 1.

    This is the partial you STORE. One hash + two bit ops per row,
    then a (keys, reg) groupBy whose map-side combine collapses each
    task to ≤ m rows — the shuffle carries registers, not data.
    Absent registers mean r = 0 (handled by the estimator).
    """
    m, wbits, _ = _hll_dims(p)
    h = h64(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    # leading zeros of the wbits-wide window + 1; w = 0 → wbits + 1.
    # length(bin(w)) = floor(log2 w) + 1 exactly (string-based — no
    # float log, no ulp exposure in either engine).
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *keys,
            h.bitwiseAND(F.lit(m - 1)).cast("int").alias("reg"),
            rho.cast("int").alias("r"),
        )
        .groupBy(*keys, "reg")
        .agg(F.max("r").alias("r"))
    )


def hll_merge(
    parts: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold a UNION of register tables (several days / sources /
    partial builds stacked with ``unionByName``) back into one
    register table per key — max is commutative, associative and
    idempotent, so re-merging already-merged partials is safe."""
    return parts.groupBy(*keys, "reg").agg(F.max("r").alias("r"))


def hll_estimate(
    parts: DataFrame,
    keys: Sequence[str],
    p: int = 10,
) -> DataFrame:
    """Cardinality estimate per key from a register table.

    Output (all exact integers — oracle-safe):
      m          INT    register count
      v_zero     INT    empty registers (linear-counting signal)
      s_pow      BIGINT Σ_j 2^(wbits+1−r_j), r_j = 0 for empty —
                        the harmonic denominator scaled by 2^(wbits+1)
                        (max m·2^(wbits+1) = 2^(61) < 2^63)
      est_q6     BIGINT trunc(raw_estimate · 10^6) where
                        raw = α_m·m²·2^(wbits+1)/s_pow and
                        α_m = 7213·m/(10000·m + 10790) EXACTLY
                        (the standard 0.7213/(1+1.079/m) as a
                        rational), computed wholly in DECIMAL(38,0)

    The small-range linear-counting correction (m·ln(m/v_zero) when
    raw ≤ 2.5m) needs ln — a libm call that is exactly the
    cross-engine ulp class this repo quarantines — so it is NOT
    baked into a column; callers that want it apply it driver-side
    from (m, v_zero), as tests/test_sketches.py demonstrates.
    """
    m, _, rho_max = _hll_dims(p)
    k2 = rho_max  # scale exponent: empty register contributes 2^k2
    per_reg = F.expr(f"shiftleft(CAST(1 AS BIGINT), {k2} - r)")
    agg = parts.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("int").alias("n_present"),
        F.sum(per_reg).alias("s_present"),
    )
    s_pow = (
        F.col("s_present")
        + (F.lit(m) - F.col("n_present")).cast("bigint")
        * F.lit(1 << k2).cast("bigint")
    ).alias("s_pow")
    out = agg.select(
        *keys,
        F.lit(m).alias("m"),
        (F.lit(m) - F.col("n_present")).cast("int").alias("v_zero"),
        s_pow,
    )
    # the numerator exceeds int64 — form it as a DECIMAL literal
    num = F.expr(f"CAST('{7213 * m**3 * (1 << k2)}' AS DECIMAL(38,0))")
    den = F.lit(10_000 * m + 10_790).cast("decimal(38,0)") * F.col(
        "s_pow"
    ).cast("decimal(38,0)")
    return out.withColumn("est_q6", q_div(num, den, 6))


# ------------------------------------------------------------------
# KMV (bottom-k) distinct sketch


def kmv_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-``keys`` bottom-k sketch: the k smallest DISTINCT portable
    hashes of ``value_col`` → (keys..., h BIGINT). Distinct first
    (map-side combined), then one per-key ordered top-k — state is k
    rows per key regardless of input size."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy("h")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, h64(F.col(value_col).cast("string")).alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_merge(
    parts: DataFrame, keys: Sequence[str], k: int = 256
) -> DataFrame:
    """Merge stacked bottom-k sketches: distinct-union the hash sets,
    keep the bottom k again. Identical to sketching the unioned raw
    data (the KMV merge law pinned by tests)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy("h")
    return (
        parts.select(*keys, "h")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_estimate(
    parts: DataFrame, keys: Sequence[str], k: int = 256
) -> DataFrame:
    """Distinct-count estimate per key: EXACT n when the sketch holds
    fewer than k hashes (the set fit entirely), else the unbiased
    (k−1)·2^60/h_(k) with h_(k) = the largest kept hash. Face is
    est_q6 = trunc(estimate·10^6) in exact DECIMAL arithmetic plus
    n_kept / h_k as integer evidence columns."""
    agg = parts.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
    )
    exact = F.col("n_kept") * F.lit(10**6).cast("bigint")
    est = q_div(
        F.expr(f"CAST('{(k - 1) * (1 << 60)}' AS DECIMAL(38,0))"),
        F.col("h_k").cast("decimal(38,0)"),
        6,
    )
    return agg.withColumn(
        "est_q6",
        F.when(F.col("n_kept") < k, exact).otherwise(est),
    )


def kmv_set_ops(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Set-overlap estimates between two SINGLE-SET sketches (one
    column ``h`` each — pre-filter a keyed sketch to one key):

      union_est_q6    bottom-k over A ∪ B (the KMV union law)
      jaccard_q6      |X ∩ A ∩ B| / |X|, X = that bottom-k — the
                      standard KMV Jaccard estimator
      inter_est_q6    trunc(jaccard · union_est) via one exact
                      DECIMAL multiply-divide

    All three faces are exact integer quantizations; the whole
    computation is two tiny (≤ k-row) frames — broadcastable,
    driver-safe at any source scale because the sketches already
    bounded it."""
    a = sketch_a.select(F.col("h"), F.lit(1).alias("in_a"))
    b = sketch_b.select(F.col("h"), F.lit(1).alias("in_b"))
    both = (
        a.join(b, "h", "full_outer")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("x_n"),
        F.max("h").alias("h_k"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1)
            .otherwise(0)
        ).alias("x_both"),
    )
    union_exact = F.col("x_n") * F.lit(10**6).cast("bigint")
    union_est = F.when(F.col("x_n") < k, union_exact).otherwise(
        q_div(
            F.expr(f"CAST('{(k - 1) * (1 << 60)}' AS DECIMAL(38,0))"),
            F.col("h_k").cast("decimal(38,0)"),
            6,
        )
    )
    out = agg.withColumn("union_est_q6", union_est)
    jac = q_div(
        F.col("x_both").cast("decimal(38,0)"),
        F.col("x_n").cast("decimal(38,0)"),
        6,
    )
    out = out.withColumn("jaccard_q6", jac)
    inter = q_div(
        F.col("x_both").cast("decimal(38,0)")
        * F.col("union_est_q6").cast("decimal(38,0)"),
        F.col("x_n").cast("decimal(38,0)") * F.lit(10**6),
        6,
    )
    return out.withColumn("inter_est_q6", inter).select(
        "x_n", "x_both", "h_k", "union_est_q6", "jaccard_q6",
        "inter_est_q6",
    )


# ------------------------------------------------------------------
# Count-Min frequency sketch


def cms_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Per-``keys`` Count-Min counter table over ``value_col``:
    (keys..., row_i INT, bucket INT, cnt BIGINT). Each input row
    lands in d buckets (one per universal-hash row — the repo's
    MinHash (a, b) family); the groupBy's map-side combine bounds
    every task's shuffle output at d·w rows. Merge = sum."""
    params = minhash_params(d)
    h = h64(F.col(value_col).cast("string"))
    hits = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_i"),
                    F.pmod(perm_hash(h, a, b), F.lit(w))
                    .cast("int")
                    .alias("bucket"),
                )
                for i, (a, b) in enumerate(params)
            ]
        )
    ).alias("hit")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, hits)
        .select(*keys, "hit.row_i", "hit.bucket")
        .groupBy(*keys, "row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(
    parts: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold stacked counter tables: sum per (keys, row_i, bucket)."""
    return parts.groupBy(*keys, "row_i", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_apply_changes(
    sketch: DataFrame,
    changes: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Maintain a Count-Min sketch from a Delta CHANGE FEED batch
    (``table_changes`` output: table columns + ``_change_type``) —
    the turnstile-model property that makes CMS the one sketch here
    that supports DELETES: counters are plain sums, so
    ``insert``/``update_postimage`` rows +1 their d buckets and
    ``delete``/``update_preimage`` rows −1 them, and the maintained
    counter matrix equals a from-scratch rebuild over the current
    table EXACTLY (pinned in tests). O(changed rows · d) work per
    refresh; the merge touches only hit buckets.

    HLL and KMV are deliberately NOT given this: max / bottom-k are
    not invertible (a delete cannot lower a register), so their
    incremental posture is insert-only folding (hll_merge/kmv_merge)
    with epoch rebuilds when removals must be reflected — documented
    here so nobody wires them to a change feed and silently
    over-counts."""
    params = minhash_params(d)
    h = h64(F.col(value_col).cast("string"))
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"),
        F.lit(1),
    ).otherwise(F.lit(-1))
    hits = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_i"),
                    F.pmod(perm_hash(h, a, b), F.lit(w))
                    .cast("int")
                    .alias("bucket"),
                )
                for i, (a, b) in enumerate(params)
            ]
        )
    ).alias("hit")
    delta = (
        changes.filter(F.col(value_col).isNotNull())
        .select(sign.alias("_sign"), hits)
        .select("_sign", "hit.row_i", "hit.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.sum("_sign").alias("_dc"))
    )
    merged = sketch.join(delta, ["row_i", "bucket"], "full_outer").select(
        "row_i",
        "bucket",
        (
            F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))
            + F.coalesce(F.col("_dc"), F.lit(0).cast("bigint"))
        ).alias("cnt"),
    )
    return merged.filter(F.col("cnt") != 0)


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``probes[value_col]`` against a
    single-set sketch (no keys — pre-filter a keyed sketch): the
    classic min over the d counters each probe hashes to. Missing
    buckets count 0. The sketch side is d·w rows at most —
    broadcast — so probing N items is one broadcast join, no
    shuffle of the probe stream. Estimates are exact integers and
    NEVER under the true count (CMS guarantee, pinned in tests)."""
    params = minhash_params(d)
    h = h64(F.col(value_col).cast("string"))
    hits = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_i"),
                    F.pmod(perm_hash(h, a, b), F.lit(w))
                    .cast("int")
                    .alias("bucket"),
                )
                for i, (a, b) in enumerate(params)
            ]
        )
    ).alias("hit")
    probe_buckets = probes.select(
        F.col(value_col).alias("probe"), hits
    ).select("probe", "hit.row_i", "hit.bucket")
    joined = probe_buckets.join(
        F.broadcast(sketch.select("row_i", "bucket", "cnt")),
        ["row_i", "bucket"],
        "left",
    ).select(
        "probe", F.coalesce("cnt", F.lit(0).cast("bigint")).alias("cnt")
    )
    return joined.groupBy("probe").agg(F.min("cnt").alias("est_cnt"))


# ------------------------------------------------------------------
# Bloom filter (membership sketch)


def _bloom_positions(value_col: str, m_bits: int, k: int):
    """k deterministic bit positions for a value — the same portable
    h64 + universal-hash family as the CMS rows."""
    params = minhash_params(k)
    h = h64(F.col(value_col).cast("string"))
    return [
        F.pmod(perm_hash(h, a, b), F.lit(m_bits)) for a, b in params
    ]


def bloom_partials(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Bloom filter as DATA: (block BIGINT, bits BIGINT) rows, 32
    filter bits per block (shift stays ≤ 31 — DuckDB raises on
    1 << 63 while Spark wraps, so the 64-bit block layout is NOT
    engine-portable), block = position >> 5. Each input value
    sets k bits (portable universal hashes); the groupBy's map-side
    combine ORs per task, the shuffle carries ≤ m/64 rows per task,
    and the sketch table is at most m/32 rows total (32,768 rows at
    m = 2^20 — broadcastable). Merge across partials/days =
    ``bloom_merge`` (bit_or is commutative/associative/idempotent,
    the same contract as the HLL max-merge).

    False-positive rate ≈ (1 − e^(−k·n/m))^k; NO false negatives —
    the guarantee :func:`bloom_semi_join` builds on."""
    hits = F.explode(
        F.array(
            *[
                F.struct(
                    F.shiftright(pos.cast("bigint"), 5).alias("block"),
                    pos.cast("bigint").alias("_pos"),
                )
                for pos in _bloom_positions(value_col, m_bits, k)
            ]
        )
    ).alias("hit")
    flat = (
        df.filter(F.col(value_col).isNotNull())
        .select(hits)
        .select(
            F.col("hit.block").alias("block"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                " CAST(hit._pos & 31 AS INT))"
            ).alias("mask"),
        )
    )
    return flat.groupBy("block").agg(F.bit_or("mask").alias("bits"))


def bloom_merge(parts: DataFrame) -> DataFrame:
    """OR-fold stacked bloom block tables into one."""
    return parts.groupBy("block").agg(F.bit_or("bits").alias("bits"))


def bloom_semi_join(
    big: DataFrame,
    sketch: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Keep the rows of ``big`` whose ``value_col`` MIGHT be in the
    set the sketch summarizes — the bloom-accelerated semi-join: the
    huge side never shuffles on the join key; it explodes to k probe
    rows, broadcast-joins the ≤ m/32-row block table, and a row
    survives iff ALL k bits are set. No false negatives (every true
    member survives — pinned in tests); survivors carry the bloom's
    false-positive rate, so follow with the exact join/anti-join on
    the (much smaller) survivor set when exactness matters."""
    import uuid

    rid = f"__bloom_rid_{uuid.uuid4().hex[:8]}"
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.shiftright(pos.cast("bigint"), 5).alias("block"),
                    pos.cast("bigint").alias("_pos"),
                )
                for pos in _bloom_positions(value_col, m_bits, k)
            ]
        )
    ).alias("pr")
    tagged = big.withColumn(rid, F.monotonically_increasing_id())
    flat = tagged.select(F.col(rid), probes).select(
        rid,
        F.col("pr.block").alias("block"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pr._pos & 31 AS INT))"
        ).alias("mask"),
    )
    hits = (
        flat.join(F.broadcast(sketch), "block", "left")
        .select(
            rid,
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask"))
                   == F.col("mask")),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy(rid)
        .agg(F.sum("hit").alias("n_hit"))
        .filter(F.col("n_hit") == k)
        .select(rid)
    )
    return tagged.join(hits, rid, "semi").drop(rid)


# ------------------------------------------------------------------
# HDR-histogram quantile sketch


def hdr_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    sub_bits: int = 5,
) -> DataFrame:
    """Mergeable quantile sketch over NON-NEGATIVE INTEGER values
    (quantize doubles to micros/cents first — the repo's float
    quarantine): HdrHistogram-style exponential buckets with
    2^sub_bits linear sub-buckets each, i.e. value v lands in

        b   = max(bitlen(v) − sub_bits, 0)     [resolution shift]
        sub = v >> b                           [bin lower ≈ sub << b]

    so every bin spans 2^b values and the RELATIVE error of reading a
    value as its bin lower bound is < 2^(1−sub_bits) (~6% at the
    default 5 — tighten with more sub_bits). All bit math
    (``length(bin(v))``, shifts) — exact in any engine, unlike
    DDSketch's log-gamma bins (libm). Output (keys..., b, sub, n):
    sum-mergeable, ≤ sub_bits·64·2^sub_bits rows per key regardless
    of data size — the store-daily-partials quantile pattern where
    exact global sorts are unaffordable."""
    v = F.col(value_col).cast("bigint")
    bitlen = F.when(v <= 0, F.lit(0)).otherwise(
        F.length(F.bin(v))
    )
    b = F.greatest(bitlen - F.lit(sub_bits), F.lit(0))
    binned = df.filter(v >= 0).select(
        *keys,
        b.cast("int").alias("b"),
        F.expr(
            f"shiftright(CAST({value_col} AS BIGINT),"
            f" CAST(greatest(length(bin(CAST({value_col} AS"
            f" BIGINT))) - {sub_bits}, 0) AS INT))"
        ).alias("sub"),
    )
    return binned.groupBy(*keys, "b", "sub").agg(
        F.count(F.lit(1)).alias("n")
    )


def hdr_merge(parts: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Sum-fold stacked HDR bin tables (days / sources / shards)."""
    return parts.groupBy(*keys, "b", "sub").agg(
        F.sum("n").alias("n")
    )


def hdr_quantiles(
    parts: DataFrame,
    keys: Sequence[str],
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Nearest-rank quantile estimates from a bin table: per key and
    q, the LOWER BOUND (sub << b — an exact integer) of the bin
    containing the ceil(q·n)-th value. Bins are disjoint value
    intervals, so ordering by the lower bound is the value order;
    one windowed cumulative sum per key (bin count is bounded, not
    data-sized). Output (keys..., q_permille INT, est BIGINT) — the
    all-integer face."""
    from pyspark.sql import Window

    lower = F.expr("shiftleft(sub, CAST(b AS INT))")
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(
        "lower"
    )
    tot_w = Window.partitionBy(*[F.col(c) for c in keys])
    cum = (
        parts.select(*keys, lower.alias("lower"), "n")
        .withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(tot_w))
    )
    out = None
    for q in qs:
        qp = int(round(q * 1000))
        # ceil(total·q) in pure integer math — no double division
        rank = F.expr(f"(total * {qp} + 999) div 1000")
        hit = (
            cum.filter(F.col("cum") >= rank)
            .groupBy(*keys)
            .agg(F.min("lower").alias("est"))
            .select(
                *keys,
                F.lit(qp).cast("int").alias("q_permille"),
                "est",
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


# ------------------------------------------------------------------
# Epoch rebuild — the delete path for NON-invertible sketches


def sketch_epoch_rebuild(
    current: DataFrame,
    partials: DataFrame,
    changes: DataFrame,
    epoch_col: str,
    partial_fn,
) -> DataFrame:
    """Refresh an EPOCH-PARTITIONED sketch-partial store after a
    change batch, for sketches whose merge is NOT invertible (HLL's
    max, KMV's bottom-k — a delete cannot lower a register, so
    ``cms_apply_changes``-style turnstile maintenance is impossible
    for them; this is their documented compaction path).

    The store layout IS the trick: partials are kept per epoch (day /
    ingest batch — ``epoch_col`` must be one of the partial's group
    keys), so a delete only poisons the epochs it touches. Given the
    change batch (Delta CDF output or any frame carrying
    ``epoch_col``), the refresh is:

      1. epochs touched by ANY change row → recompute their partials
         from ``current`` (the post-change table) restricted to those
         epochs — an epoch-pruned rescan, O(changed epochs), never a
         full-table pass;
      2. untouched epochs keep their STORED partials byte-for-byte;
      3. the result unions both — pinned equal to a from-scratch
         ``partial_fn(current)`` over the whole table
         (tests/test_sketches.py::test_epoch_rebuild_*).

    ``partial_fn`` is the sketch constructor closed over everything
    but the frame — e.g. ``lambda df: hll_partials(df, ["day",
    "event_type"], "user_id", p=10)`` or the ``kmv_partials``
    equivalent. Estimates then fold epochs away with the normal
    merge (``hll_merge`` / ``kmv_merge``) — max / bottom-k are
    idempotent, so the fold is safe on any stacking.

    At 100 TB: the touched-epoch set is days, not rows — it
    broadcasts; the rescan prunes on the epoch partition column
    (storage-level partition pruning when ``current`` is a
    date-partitioned table); the kept partials never touch raw data.
    """
    touched = changes.select(epoch_col).distinct()
    kept = partials.join(F.broadcast(touched), epoch_col, "left_anti")
    dirty = current.join(F.broadcast(touched), epoch_col, "left_semi")
    return kept.unionByName(partial_fn(dirty))


def kmv_diff_ops(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch-style set DIFFERENCE estimates from two single-set
    bottom-k sketches (columns ``h``) — the A-not-B operation the
    audience/segment workflows need on top of :func:`kmv_set_ops`'
    union/intersection/Jaccard:

      x_n, h_k         size / max hash of X = bottom-k(A ∪ B)
      d_ab, d_ba       members of X seen only in A / only in B
      union_est_q6     the KMV union estimate (exact below k)
      diff_ab_est_q6   trunc((d_ab / x_n) · union_est · 10^6) — the
                       standard theta A-not-B estimator
      diff_ba_est_q6   symmetric B-not-A

    Every output is an exact integer quantization (DECIMAL(38,0)
    multiply-divide, no doubles), so the face is engine-exact. The
    whole computation touches two ≤ k-row frames — bounded state
    regardless of the source cardinality the sketches summarize."""
    a = sketch_a.select(F.col("h"), F.lit(1).alias("in_a"))
    b = sketch_b.select(F.col("h"), F.lit(1).alias("in_b"))
    both = (
        a.join(b, "h", "full_outer")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("x_n"),
        F.max("h").alias("h_k"),
        F.coalesce(
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 0), 1)
                .otherwise(0)
            ),
            F.lit(0),
        ).cast("bigint").alias("d_ab"),
        F.coalesce(
            F.sum(
                F.when((F.col("in_a") == 0) & (F.col("in_b") == 1), 1)
                .otherwise(0)
            ),
            F.lit(0),
        ).cast("bigint").alias("d_ba"),
    )
    union_exact = F.col("x_n") * F.lit(10**6).cast("bigint")
    union_est = F.when(F.col("x_n") < k, union_exact).otherwise(
        q_div(
            F.expr(f"CAST('{(k - 1) * (1 << 60)}' AS DECIMAL(38,0))"),
            F.col("h_k").cast("decimal(38,0)"),
            6,
        )
    )
    out = agg.withColumn("union_est_q6", union_est)
    for side in ("ab", "ba"):
        out = out.withColumn(
            f"diff_{side}_est_q6",
            # two empty sketches: x_n = 0 would NULL the q_div
            # (division by zero) — a defined empty diff is 0, same
            # shape as the n_kept < k exact branch
            F.when(F.col("x_n") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                q_div(
                    F.col(f"d_{side}").cast("decimal(38,0)")
                    * F.col("union_est_q6").cast("decimal(38,0)"),
                    F.col("x_n").cast("decimal(38,0)") * F.lit(10**6),
                    6,
                )
            ),
        )
    return out.select(
        "x_n", "h_k", "d_ab", "d_ba", "union_est_q6",
        "diff_ab_est_q6", "diff_ba_est_q6",
    )
