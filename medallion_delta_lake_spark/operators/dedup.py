"""Near-duplicate detection operators for LLM training-data pipelines
(SURVEY.md §2.11 extension surface).

Four escalating strategies, all DataFrame-native, no Python UDFs. The
hot hash paths (shingle hashing, SimHash votes) run as explode →
codegen'd expressions → grouped aggregation with map-side combine —
measured faster than the equivalent higher-order-function folds, which
Spark evaluates interpreted (CodegenFallback). A consolidated
"collect_set + 16 signature mins in one aggregate" variant was
measured SLOWER than the two-step cache-and-derive structure used
here, so don't "simplify" back to it:

- exact:   8-byte content-hash groupBy — shuffles hashes, not text.
- n-gram:  inverted-index self-join on shingle *hashes* (bigint), so
           the pair-generation shuffle carries 16 bytes per posting.
- MinHash: fixed-width signatures + banded LSH join; candidate pairs
           are verified with exact Jaccard. The only all-pairs work
           happens within a band bucket.
- SimHash: 32-bit signature; banded hamming join (pigeonhole: any pair
           within distance d shares ≥1 of d+1 bands).

Scale notes (100 TB corpus): every join key here is a bigint; the
labeled side of each self-join is the *posting list*, never the raw
text, so shuffle volume is O(docs × shingles × 16 B), not O(corpus).
Pathological shingles (boilerplate appearing in millions of docs)
are dropped with ``max_df`` before pair generation — that cap is the
difference between a linear pass and a quadratic blowup, so it is ON
by default (:data:`DEFAULT_MAX_DF`); the registered queries' DuckDB
oracles model the same cap, keeping parity exact.

Hashing is the portable md5-prefix h64 (functions/hashing.py), so the
DuckDB oracles in plans/queries_text.py reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators.caching import tracked_cache
from medallion_delta_lake_spark.functions.hashing import (
    B_ROLL,
    P_ROLL,
    h64,
    minhash_params,
    perm_hash,
)
from medallion_delta_lake_spark.functions.texts import (
    normalize_text,
    shingles,
    tokenize,
)

# Boilerplate cap for inverted-index pair generation: a shingle shared
# by d docs emits O(d²) candidate pairs, so posting lists above this
# document frequency are dropped before the self-join. 256 keeps every
# realistic near-dup signal (any true near-dup pair shares many rarer
# shingles too) while bounding the worst bucket at ~32k pairs.
DEFAULT_MAX_DF = 256


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content hash: one surviving (minimum) id per
    normalized text, plus the duplicate count. GroupBy on the 60-bit
    hash — the shuffle carries (hash, id), never the document."""
    hashed = df.select(
        F.col(id_col), h64(normalize_text(text_col)).alias("content_hash")
    )
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def shingle_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    fan_out: int | None = None,
) -> DataFrame:
    """(id, array<bigint> of distinct word-n-gram shingle hashes).

    Explode → codegen'd md5 → collect_set, NOT a higher-order
    ``transform``: HOF lambdas are interpreted (CodegenFallback), so
    hashing inside one keeps the hottest expression off codegen —
    measured 1.5× slower at 50k docs and widening with scale. The
    explode path pays one extra shuffle on the id but hashes inside
    whole-stage codegen with map-side combine. Cardinality is
    preserved join-free: shingles() yields ≥1 element for every
    document (short/empty docs produce the whole text as one shingle).

    ``fan_out`` repartitions first so a single-file corpus doesn't
    generate shingles on one task."""
    if fan_out:
        df = df.repartition(fan_out)
    exploded = df.select(
        F.col(id_col), F.explode(shingles(text_col, n=n)).alias("_sg")
    )
    return (
        exploded.select(F.col(id_col), h64(F.col("_sg")).alias("_h"))
        .groupBy(id_col)
        .agg(F.collect_set("_h").alias("sh"))
    )


def _pair_jaccard(pairs: DataFrame, sets_df: DataFrame, id_col: str) -> DataFrame:
    """Attach exact Jaccard over shingle-hash sets to (id_a, id_b)."""
    a = sets_df.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_df.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return joined.select(
        "id_a",
        "id_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_df: int | None = DEFAULT_MAX_DF,
    fan_out: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard ≥ threshold, generated
    with an inverted-index self-join (docs only pair up if they share a
    shingle — never a blind cross join). ``max_df`` drops shingles that
    occur in more than that many documents before pair generation —
    the boilerplate cap, ON by default (:data:`DEFAULT_MAX_DF`): a
    shingle shared by d documents emits O(d²) candidate pairs, so one
    boilerplate header across a 100 TB corpus would otherwise melt the
    join. Only candidate GENERATION is capped; the exact Jaccard score
    still uses the full shingle sets. Pass ``max_df=None`` to disable."""
    sets_df = tracked_cache(shingle_hashes(df, text_col, id_col, n=n, fan_out=fan_out))
    postings = sets_df.select(
        F.col(id_col), F.explode("sh").alias("shingle_hash")
    )
    if max_df is not None:
        ok = (
            postings.groupBy("shingle_hash")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_df)
            .select("shingle_hash")
        )
        postings = postings.join(ok, "shingle_hash")
    left = postings.select(
        F.col("shingle_hash"), F.col(id_col).alias("id_a")
    )
    right = postings.select(
        F.col("shingle_hash"), F.col(id_col).alias("id_b")
    )
    pairs = (
        left.join(right, "shingle_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    out = _pair_jaccard(pairs, sets_df, id_col)
    return out.filter(F.col("jaccard") >= threshold)


def minhash_signature_cols(sh: Column, num_perm: int) -> list[Column]:
    """MinHash signature of a shingle-hash array: for each universal
    hash h_i, min over the set. Empty sets yield NULL mins."""
    return [
        F.array_min(F.transform(sh, lambda x: perm_hash(x, a, b)))
        for (a, b) in minhash_params(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    fan_out: int | None = None,
) -> DataFrame:
    """Long-form MinHash signatures: (id, perm, minhash). Long form
    keeps the oracle comparison schema-stable for any num_perm."""
    sets_df = shingle_hashes(df, text_col, id_col, n=n, fan_out=fan_out)
    sig = sets_df.select(
        F.col(id_col),
        F.posexplode(
            F.array(*minhash_signature_cols(F.col("sh"), num_perm))
        ).alias("perm", "minhash"),
    )
    return sig


def _band_key(sig_slice: Column) -> Column:
    """Fold a band's minhash values into one bigint bucket key
    (same polynomial fold as the rolling fingerprint)."""
    return F.aggregate(
        sig_slice,
        F.lit(0).cast("bigint"),
        lambda s, x: (s * F.lit(B_ROLL) + x % F.lit(P_ROLL)) % F.lit(P_ROLL),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    fan_out: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact Jaccard.

    Signature → ``bands`` buckets of ``num_perm//bands`` rows; docs
    sharing any band bucket become candidates; candidates are verified
    against the exact shingle-set Jaccard (no false positives in the
    output — LSH only bounds recall). This is the sub-quadratic scale
    path: the all-pairs comparison only ever happens inside a bucket."""
    rows_per_band = num_perm // bands
    # One grouped pass over the exploded shingle hashes yields BOTH
    # the exact shingle set (jaccard verify) and the num_perm
    # signature mins: min over the multiset == min over the set, so
    # no distinct is needed, and the permutations run as FLAT codegen
    # arithmetic with map-side combine instead of num_perm interpreted
    # array-transform lambdas (HOFs are CodegenFallback; the lambda
    # form also cost ~9 s of first-plan compile on this shape —
    # measured, the whole dedup family's bench outlier). Cached: both
    # frames are consumed twice (banded self-join sides / two
    # jaccard-verify joins). Tracked: callers release via
    # operators.caching.release_caches() after their action.
    if fan_out:
        df = df.repartition(fan_out)
    exploded = df.select(
        F.col(id_col), F.explode(shingles(text_col, n=n)).alias("_sg")
    ).select(F.col(id_col), h64(F.col("_sg")).alias("_h"))
    perm_mins = [
        F.min(perm_hash(F.col("_h"), a, b)).alias(f"_m{i}")
        for i, (a, b) in enumerate(minhash_params(num_perm))
    ]
    both = tracked_cache(
        exploded.groupBy(id_col).agg(
            F.collect_set("_h").alias("sh"), *perm_mins
        )
    )
    sets_df = both.select(id_col, "sh")
    sig = both.select(
        F.col(id_col),
        F.array(*[f"_m{i}" for i in range(num_perm)]).alias("sig"),
    )
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    _band_key(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    left = banded.select("band", "band_key", F.col(id_col).alias("id_a"))
    right = banded.select("band", "band_key", F.col(id_col).alias("id_b"))
    pairs = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    out = _pair_jaccard(pairs, sets_df, id_col)
    return out.filter(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    fan_out: int | None = None,
) -> DataFrame:
    """SimHash signature: per bit j, sum ±1 over token hashes' j-th bit
    (duplicates weight naturally, explode keeps them); bit set iff the
    sum ≥ 0.

    Explode → codegen md5 → 32 conditional SUMs in one grouped
    aggregate, not a higher-order fold: HOF lambdas are interpreted,
    and the grouped formulation gets whole-stage codegen plus map-side
    partial aggregation (verified bit-identical, 1.6× faster at 50k
    docs and widening with scale). Integer vote sums are
    order-independent, so the result is deterministic."""
    if fan_out:
        df = df.repartition(fan_out)
    exploded = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("_t")
    )
    hashed = exploded.select(F.col(id_col), h64(F.col("_t")).alias("_h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("_h", j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"_v{j}")
            for j in range(bits)
        ]
    )
    sig = F.lit(0).cast("bigint")
    for j in range(bits):
        sig = sig + F.when(
            F.col(f"_v{j}") >= 0, F.lit(2**j).cast("bigint")
        ).otherwise(0)
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    fan_out: int | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ ``max_hamming``,
    found via banded join (pigeonhole: distance ≤ d ⇒ some band of
    d+1 is identical — use bands ≥ max_hamming+1 for exact recall)."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    # cache: the 32-vote signature tree is consumed by both self-join
    # sides — materialize once (tracked; see operators/caching.py)
    sh = tracked_cache(simhash(df, text_col, id_col, bits=bits, fan_out=fan_out))
    banded = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    left = banded.select(
        "band", "band_key", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    right = banded.select(
        "band", "band_key", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    pairs = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def neardup_clusters(
    ids_df: DataFrame,
    pairs_df: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over the near-dup pair graph → one cluster
    representative (minimum id) per document. The step that turns
    pairwise dedup output into "keep one copy per duplicate group".

    Iterative min-label propagation: each round every node takes the
    minimum label among itself and its neighbors; converges in
    O(graph diameter) rounds (near-dup clusters are tiny, so 2–3 in
    practice; ``max_iter`` bounds pathological chains). Each round is
    one join + one groupBy on the id — all DataFrame ops, deterministic
    result regardless of execution order. ``localCheckpoint`` cuts the
    lineage so plans don't grow with iterations. GraphFrames'
    connectedComponents is the drop-in at extreme scale; this
    formulation avoids the extra dependency.
    """
    edges = pairs_df.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    edges = tracked_cache(
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    labels = ids_df.select(
        F.col(id_col), F.col(id_col).alias("cluster")
    ).localCheckpoint()
    for _ in range(max_iter):
        neighbor = (
            edges.join(labels, edges["dst"] == labels[id_col])
            .select(F.col("src").alias(id_col), "cluster")
        )
        # fold the convergence flag into the same materialization as the
        # new labels: one checkpoint job + one trivial scan-count per
        # round, instead of a separate join+count job (measured 5.2 s →
        # 2.8 s for the loop at sf0.1 — per-round job overhead dominates
        # on near-dup-sized clusters)
        old = labels.select(
            F.col(id_col).alias("_oid"), F.col("cluster").alias("_oc")
        )
        flagged = (
            labels.unionByName(neighbor)
            .groupBy(id_col)
            .agg(F.min("cluster").alias("cluster"))
            .join(old, F.col(id_col) == F.col("_oid"))
            .select(
                id_col,
                "cluster",
                (F.col("cluster") != F.col("_oc")).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = flagged.filter(F.col("_chg")).count()
        labels = flagged.drop("_chg")
        if changed == 0:
            return labels
    # an unconverged return would silently hand back WRONG cluster ids
    # (VERDICT r7 #7) — fail loudly and name the long-chain remedy
    raise RuntimeError(
        f"min-label propagation did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter); use neardup_clusters_star "
        "— O(log n) rounds — for long-chain graphs"
    )


def neardup_clusters_star(
    ids_df: DataFrame,
    pairs_df: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — the O(log n)-round posture for graphs with
    LONG CHAINS, where :func:`neardup_clusters`'s min-label
    propagation needs O(diameter) rounds (VERDICT r7 #7). Same output
    contract: (id, cluster = component minimum id).

    Per round, two grouped passes over the edge list:

    * **large-star**: every node u computes m = min(u ∪ Γ(u)) and
      re-points each STRICTLY GREATER neighbor at m — long tails
      collapse toward small ids without ever increasing edge count;
    * **small-star**: every node u re-points its ≤ neighbors (and
      itself) at their minimum — the local star flattens.

    Both passes are a groupBy(min) + self-join on int ids; no
    adjacency list ever materializes on one executor, so a
    billion-edge graph runs at shuffle bandwidth. Convergence is
    detected by an order-insensitive edge-set fingerprint (count +
    xor-ish hash sum), one tiny aggregate per round.

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge
    (2·log₂(n) rounds suffice per the paper, so 25 covers any graph
    this engine will meet; an unconverged return would silently
    mislabel — fail loudly instead)."""
    e = pairs_df.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).filter(F.col("u") != F.col("v"))
    # undirected edge set, kept symmetric so one groupBy(u) sees the
    # full neighborhood of every node
    edges = tracked_cache(
        e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    )

    def _fingerprint(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulation: a long sum of 64-bit hashes
            # overflows under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _swap(df: DataFrame) -> DataFrame:
        return df.select(F.col("v").alias("u"), F.col("u").alias("v"))

    fp = _fingerprint(edges)
    for _ in range(max_iter):
        # Every frame referenced twice in the round (large via its
        # swap-union, lo via the min + join) MATERIALIZES before
        # reuse: left as lineage, the final distinct recomputes the
        # large-star subtree ~8× (measured 7.5 s/round); .cache()
        # instead of checkpoint leaves InMemoryRelations that block
        # AQE partition coalescing (measured 2× worse). Eager
        # localCheckpoints keep each reuse O(1) and the stage graph
        # AQE-sized.
        mins = edges.groupBy("u").agg(
            F.least(F.col("u"), F.min("v")).alias("m")
        )
        # large-star: (v, m_u) for every neighbor v > u; m ≤ u < v so
        # no self loops possible
        large = (
            edges.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        ).localCheckpoint()
        large_sym = large.unionByName(_swap(large))
        # small-star over the large-star output: (v, m_u) for v ≤ u,
        # plus (u, m_u) so the center stays attached.
        # r16 A/B note: r15 demoted lo to a plain filter over the
        # checkpointed large frame and made the round-end checkpoint
        # lazy (4 → 2 eager jobs/round); that structure read SLOWER in
        # every full-bench run (1.21-1.23× band-relative; restoring the
        # eager checkpoints measured 0.80× — the filter re-applied per
        # consumer and the fused fingerprint/materialize job lost more
        # than the saved job overhead). Eager checkpoints restored;
        # see OPTIMIZATION_r16.md "dedup-cc-bigstar".
        lo = large_sym.filter(F.col("v") <= F.col("u")).localCheckpoint()
        small_mins = lo.groupBy("u").agg(
            F.least(F.col("u"), F.min("v")).alias("m")
        )
        small = (
            lo.join(small_mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(
                small_mins.select(F.col("u"), F.col("m").alias("v"))
            )
        ).filter(F.col("u") != F.col("v"))
        edges_new = (
            small.unionByName(_swap(small))
            .distinct()
            .localCheckpoint()
        )
        new_fp = _fingerprint(edges_new)
        edges = edges_new
        if new_fp == fp:
            # fixpoint: every component is a star around its minimum
            lbl = edges.groupBy("u").agg(F.min("v").alias("_mn"))
            return ids_df.select(id_col).join(
                lbl, ids_df[id_col] == lbl["u"], "left"
            ).select(
                F.col(id_col),
                F.least(
                    F.col(id_col), F.coalesce("_mn", F.col(id_col))
                ).alias("cluster"),
            )
        fp = new_fp
    raise RuntimeError(
        f"star contraction did not converge in {max_iter} rounds — "
        "graph larger than 2^(max_iter/2) nodes? raise max_iter"
    )


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    fan_out: int | None = None,
) -> DataFrame:
    """Long-form banded MinHash signatures: (id, band, band_key) — the
    rows a persistent LSH signature STORE keeps (4 rows/doc at the
    default banding; 20 bytes each). The store is what makes dedup
    incremental at 100 TB: new batches hash once and equi-join here
    instead of re-hashing history."""
    rows_per_band = num_perm // bands
    sets_df = shingle_hashes(df, text_col, id_col, n=n, fan_out=fan_out)
    sig = sets_df.select(
        F.col(id_col),
        F.array(*minhash_signature_cols(F.col("sh"), num_perm)).alias("sig"),
    )
    return sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    _band_key(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )


def incremental_neardup(
    spark,
    new_docs: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    fan_out: int | None = None,
    within_batch: bool = False,
    batch_id: int | None = None,
) -> DataFrame:
    """Incremental near-dup detection against a persistent signature
    store (the daily-batch production shape: history is never
    re-hashed).

    Returns the new docs labeled ``dup_of`` (the minimum existing
    store id sharing any LSH band, NULL if none — candidate-level
    match; callers wanting exact-Jaccard verification join the texts
    of the flagged pairs only). Non-duplicate new docs' signatures are
    APPENDED to the store, so the next batch sees them as history.

    Contract: by default the comparison is HISTORY-ONLY — two
    duplicates arriving in the same batch are both kept (both NULL,
    both appended), intentionally: the corpus pipeline dedups each
    batch internally before calling this, and re-flagging here would
    double-count. Pass ``within_batch=True`` for standalone use: the
    batch then also self-joins on its bands, each doc aliasing to the
    minimum smaller batch id sharing a band (same representative rule
    as the batch LSH clusterer), and only band-group minima reach the
    store.

    Scale shape: one hash pass over the batch; the history side is a
    (band, band_key)-keyed equi-join — with the store bucketed/
    partitioned on band_key the probe touches matching buckets only.
    The optional within-batch pass is a band-bucket self-join
    (Σ|bucket|² over batch-sized buckets, never N²). Store growth is
    4 narrow rows per surviving doc.

    ``batch_id`` (streaming replay safety): when set, the store is
    laid out hive-partitioned by ``ingest_batch`` and this call is
    IDEMPOTENT for that id — the history probe EXCLUDES the batch's
    own partition (so an at-least-once replay that already appended
    its signatures doesn't label every doc a duplicate of itself) and
    the surviving signatures land via partition-directory overwrite
    rather than blind append (so a replay can't double-write). The
    labels are deterministic (min matching id), so a replay reproduces
    byte-identical output.
    """
    import os as _os

    from medallion_delta_lake_spark.sources import writers

    new_sigs = tracked_cache(
        banded_signatures(
            new_docs, text_col, id_col,
            n=n, num_perm=num_perm, bands=bands, fan_out=fan_out,
        )
    )
    candidates = []
    if writers.table_exists(spark, store_path):
        store = spark.read.parquet(store_path)
        if batch_id is not None and "ingest_batch" in store.columns:
            # partition-pruned: replayed own-batch rows are not history
            store = store.filter(F.col("ingest_batch") != F.lit(batch_id))
        store = store.select(
            F.col(id_col).alias("_hist_id"), "band", "band_key"
        )
        candidates.append(
            new_sigs.join(store, ["band", "band_key"]).select(
                F.col(id_col), F.col("_hist_id").alias("_cand")
            )
        )
    if within_batch:
        peers = new_sigs.select(
            F.col(id_col).alias("_peer_id"), "band", "band_key"
        )
        candidates.append(
            new_sigs.join(peers, ["band", "band_key"])
            .filter(F.col("_peer_id") < F.col(id_col))
            .select(F.col(id_col), F.col("_peer_id").alias("_cand"))
        )
    if candidates:
        allc = candidates[0]
        for c in candidates[1:]:
            allc = allc.unionByName(c)
        matches = allc.groupBy(id_col).agg(F.min("_cand").alias("dup_of"))
    else:
        matches = new_sigs.select(id_col).distinct().select(
            F.col(id_col), F.lit(None).cast("long").alias("dup_of")
        ).limit(0)
    labeled = (
        new_docs.join(matches, id_col, "left")
        .select(*new_docs.columns, "dup_of")
    )
    fresh_ids = labeled.filter(F.col("dup_of").isNull()).select(id_col)
    fresh_sigs = new_sigs.join(fresh_ids, id_col, "left_semi")
    if batch_id is not None:
        # idempotent: overwriting the batch's own partition directory
        # replaces any partial/duplicate output from a failed attempt
        fresh_sigs.write.mode("overwrite").parquet(
            _os.path.join(store_path, f"ingest_batch={batch_id}")
        )
    elif writers.table_exists(spark, store_path):
        fresh_sigs.write.mode("append").parquet(store_path)
    else:
        fresh_sigs.write.mode("overwrite").parquet(store_path)
    return labeled


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share
    any word ``n``-gram with an evaluation/benchmark corpus (the
    train/test-overlap scrub every pretraining pipeline runs before
    training; n-gram overlap is the standard published criterion).

    Returns (id, n_overlap, is_contaminated) for every training doc:
    ``n_overlap`` = number of DISTINCT training-doc n-grams that occur
    anywhere in the benchmark (per-doc shingles are distinct, so the
    count is set-overlap, not instance count).

    Scale shape: the benchmark corpus is orders of magnitude smaller
    than the training corpus, so its distinct-gram set is broadcast —
    the 100 TB training side never shuffles for the probe; the only
    shuffle is the per-doc groupBy on the (doc_id) key. If the
    benchmark gram set ever outgrows broadcast range, drop the hint
    and let AQE pick the join (both sides are then gram-keyed).
    """
    bench_grams = bench.select(
        F.explode(shingles(text_col, n=n)).alias("gram")
    ).distinct()
    train_grams = train.select(
        F.col(id_col), F.explode(shingles(text_col, n=n)).alias("gram")
    )
    hits = (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("bigint")
            .alias("n_overlap"),
        )
        .withColumn("is_contaminated", F.col("n_overlap") > 0)
    )


def block_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block: int = 20,
) -> DataFrame:
    """Sub-document (paragraph-level) duplication profile: split each
    document into fixed ``block``-token chunks, hash each chunk, and
    report per document how many of its chunks occur more than once in
    the whole corpus (the RefinedWeb-style intra-corpus boilerplate
    signal that document-level dedup misses).

    Returns (id, n_blocks, n_dup_blocks, dup_frac). A chunk instance
    counts as duplicated when its hash appears ≥2 times corpus-wide —
    including twice inside the same document.

    Scale shape: chunks shuffle as 8-byte hashes, never text; the
    global chunk-frequency aggregate has map-side combine, and the
    per-doc rollup is keyed by id. Both shuffles are bigint-keyed —
    the same posting-list discipline as the shingle dedup family.
    """
    toks = tokenize(text_col)
    nb = F.ceil(F.size(toks) / F.lit(float(block))).cast("int")
    block_hashes = F.transform(
        F.sequence(F.lit(0), nb - 1),
        lambda i: h64(
            F.array_join(F.slice(toks, i * block + 1, block), " ")
        ),
    )
    b = df.select(F.col(id_col), F.explode(block_hashes).alias("bh"))
    counts = b.groupBy("bh").agg(F.count(F.lit(1)).alias("c"))
    return (
        b.join(counts, "bh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum((F.col("c") > 1).cast("bigint")).alias("n_dup_blocks"),
        )
        .select(
            F.col(id_col),
            F.col("n_blocks"),
            F.col("n_dup_blocks"),
            (
                F.col("n_dup_blocks").cast("double")
                / F.col("n_blocks").cast("double")
            ).alias("dup_frac"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = DEFAULT_MAX_DF,
    fan_out: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup pairs by n-gram CONTAINMENT: for a candidate
    pair (a, b), containment = |A∩B| / min(|A|, |B|) over shingle-hash
    sets — 1.0 when the smaller document's shingles are a subset of
    the larger's. Catches the duplication Jaccard misses: a document
    quoted or concatenated inside a much larger one scores near 1.0
    here but arbitrarily low on Jaccard (the union is dominated by the
    big doc).

    Same inverted-index candidate generation as
    :func:`ngram_jaccard_pairs` — docs only pair if they share a
    shingle, pairs travel as bigint ids, ``max_df`` caps boilerplate
    postings at scale (ON by default — :data:`DEFAULT_MAX_DF`; the
    containment score itself still uses the full sets)."""
    sets_df = tracked_cache(
        shingle_hashes(df, text_col, id_col, n=n, fan_out=fan_out)
    )
    postings = sets_df.select(
        F.col(id_col), F.explode("sh").alias("shingle_hash")
    )
    if max_df is not None:
        ok = (
            postings.groupBy("shingle_hash")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_df)
            .select("shingle_hash")
        )
        postings = postings.join(ok, "shingle_hash")
    left = postings.select(F.col("shingle_hash"), F.col(id_col).alias("id_a"))
    right = postings.select(F.col("shingle_hash"), F.col(id_col).alias("id_b"))
    pairs = (
        left.join(right, "shingle_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sets_df.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_df.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    smaller = F.least(F.size("sh_a"), F.size("sh_b"))
    return joined.select(
        "id_a",
        "id_b",
        (inter.cast("double") / smaller.cast("double")).alias("containment"),
    ).filter(F.col("containment") >= threshold)


def split_leakage_pairs(
    docs: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    fan_out: int | None = None,
) -> DataFrame:
    """Train/eval leakage audit: near-duplicate pairs that CROSS a
    split boundary — the pairs that silently inflate eval scores when
    a test document's near-copy sits in train. Returns
    (id_a, id_b, jaccard, split_a, split_b) for every LSH-verified
    pair with ``split_a != split_b``.

    Deterministic hash splitting (:func:`sampling.assign_split`)
    prevents *drift* leakage across reprocessing runs, but cannot see
    near-duplicate *content*; this audit closes that hole. Scale
    shape: identical to the LSH dedup pass (banded candidates, exact
    verify on candidates only) plus two narrow id-keyed joins to
    attach split labels — text never joins or shuffles.
    """
    pairs = minhash_lsh_pairs(
        docs, text_col=text_col, id_col=id_col,
        n=n, num_perm=num_perm, bands=bands, threshold=threshold,
        fan_out=fan_out,
    )
    labels = docs.select(F.col(id_col), F.col(split_col))
    la = labels.select(
        F.col(id_col).alias("id_a"), F.col(split_col).alias("split_a")
    )
    lb = labels.select(
        F.col(id_col).alias("id_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(la, "id_a")
        .join(lb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
    )
