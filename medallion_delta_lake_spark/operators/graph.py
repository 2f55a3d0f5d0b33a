"""Iterative graph analytics on DataFrames (SURVEY.md §2.11 extension
surface — no reference counterpart; the closest sibling is the
connected-components loop in operators/dedup.py:341).

``pagerank`` is the canonical fixed-iteration power method expressed
as pure DataFrame joins/aggregations — the shape GraphX/GraphFrames
use underneath, with no RDD drop-down:

    r'(v) = (1-d)/N + d · Σ_{u→v} r(u) · w(u,v) / W(u)

Float-determinism contract (registry docstring): edge weights and
out-degrees stay INTEGER; each per-edge contribution is a double
computed by identical IEEE ops in any engine; per-node contribution
sums accumulate in DECIMAL(38,12) so partitioning/order can't change
the result. A fixed ``iters`` (not convergence-tested) keeps the
computation ANSI-SQL-expressible for the oracle.

Scale notes: each iteration is one equi-join of edges against the
current ranks (shuffle keyed by src, then by dst for the partial-agg
sum) — O(|E|) per iteration, executor-side throughout. For
billion-edge graphs, checkpoint lineage every few iterations (the
dedup CC loop shows the pattern); ranks (|V| rows) are the only
iterated state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_cache_partitions(
    df: DataFrame,
    target_bytes: int = 100 << 20,
    floor: int = 16,
    cap: int = 65536,
) -> int:
    """Partition count for a cached iterative-loop edge frame: one
    ~``target_bytes`` cached partition per Catalyst-estimated byte of
    the frame (``optimizedPlan().stats().sizeInBytes`` — file-size
    derived for parquet lineages, costs no job), floored at 16 so the
    benched sf0.1 plan shape is unchanged (estimate there is ~10 MiB
    → 16) and a 100 TB edge list gets ~|E|·row_bytes/100 MB partitions
    instead of a hardcoded constant (ADVICE r15 / VERDICT r15 #7).
    Unknown statistics make Catalyst return a Long.MaxValue-ish
    conservative size; anything absurd (> 1 PiB) falls back to the
    floor rather than exploding the partition count."""
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # py4j hiccup / non-JVM frame — keep the floor
        return floor
    if est <= 0 or est > (1 << 50):
        return floor
    return int(max(floor, min(est // target_bytes, cap)))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """Weighted PageRank over an integer-weighted edge list; returns
    ``(id, rank)`` after exactly ``iters`` power iterations from the
    uniform start. Dangling nodes (no out-edges) leak their mass per
    the simple formulation — documented, and mirrored exactly by the
    SQL oracle."""
    from medallion_delta_lake_spark.operators.caching import tracked_cache

    # materialize the (possibly expensive) edge derivation ONCE: every
    # iteration re-joins against `e`, and without the cache Spark would
    # replay the full upstream lineage per iteration (the plan audit
    # showed 3× the base-table scans before this)
    edges = tracked_cache(
        edges.select(
            F.col(src).alias(src),
            F.col(dst).alias(dst),
            F.col(weight).alias(weight),
        )
    )
    nodes = tracked_cache(
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    out_w = edges.groupBy(src).agg(
        F.sum(F.col(weight)).cast("bigint").alias("_out_w")
    )
    e = tracked_cache(edges.join(out_w, src))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "id", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for i in range(iters):
        if i and i % 5 == 0:
            # cut the growing join lineage the same way the dedup CC
            # loop does (dedup.py:383) — |V| rows, cheap to materialize
            ranks = ranks.localCheckpoint()
        contribs = e.join(
            ranks, e[src] == ranks["id"]
        ).select(
            F.col(dst).alias("id"),
            (
                F.col("rank")
                * F.col(weight).cast("double")
                / F.col("_out_w").cast("double")
            ).alias("_c"),
        )
        sums = contribs.groupBy("id").agg(
            F.sum(F.col("_c").cast("decimal(38,12)"))
            .cast("double")
            .alias("_s")
        )
        ranks = (
            nodes.join(sums, "id", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "id",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def triangle_count(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Exact triangle count of an undirected simple graph, as the
    canonical distributed plan: canonicalize each edge to (lo, hi),
    dedup, then one ordered two-hop join (a<b<c) probed against the
    edge set — every triangle is counted exactly once at its ordered
    orientation, and the ordering predicate keeps the join from
    exploding on high-degree vertices (each wedge is built only at
    its smallest endpoint). Three shuffles on int vertex ids; no
    adjacency ever collects. Output one row: ``(n_triangles,
    n_edges, n_vertices)``."""
    # The canonical edge set feeds five subtrees (both wedge sides,
    # the closing probe, the edge count, the vertex count). r15 tried
    # a tracked_cache here; r16 A/B-settled it as a LOSS in full-bench
    # context (1.19× vs 0.89× band-relative with the cache removed —
    # runtime exchange reuse already dedups the distinct's exchange,
    # so the cache only added materialization cost and storage
    # pressure; OPTIMIZATION_r16.md "triangle-count").
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("_u"),
            F.greatest(F.col(src), F.col(dst)).alias("_v"),
        )
        .filter(F.col("_u") < F.col("_v"))  # drops self-loops
        .distinct()
    )
    e1 = e.select(F.col("_u").alias("x"), F.col("_v").alias("y"))
    e2 = e.select(F.col("_u").alias("y"), F.col("_v").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closing = e.select(
        F.col("_u").alias("x"), F.col("_v").alias("z")
    )
    tri = wedges.join(closing, ["x", "z"])
    stats = e.agg(F.count(F.lit(1)).alias("n_edges"))
    verts = (
        e.select(F.col("_u").alias("v"))
        .unionByName(e.select(F.col("_v").alias("v")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
    return (
        tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(verts))
        .select(
            "n_triangles",
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_vertices").cast("bigint").alias("n_vertices"),
        )
    )


def degree_histogram(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Degree distribution of an undirected graph — (degree,
    n_nodes): the first thing to look at before ANY graph algorithm
    runs, because it prices them (triangle counting is quadratic in
    degree; components stall on hubs; LSH buckets blow up on heavy
    posting lists — the same Σd² story as dedup's max_df cap).
    Multi-edges are collapsed first (distinct canonical pairs), then
    two grouped counts: node→degree, degree→n_nodes. All int-keyed
    partial-aggregated shuffles; nothing driver-side."""
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).filter(F.col("u") != F.col("v")).distinct()
    ends = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


def jaccard_neighbors(
    edges: DataFrame,
    node: str,
    neighbor: str,
    max_degree: int = 200,
    min_common: int = 2,
) -> DataFrame:
    """Pairwise node similarity by shared neighborhoods: Jaccard
    ``|N(a)∩N(b)| / |N(a)∪N(b)|`` over a bipartite edge list — the
    entity-resolution / collaborative-filtering primitive ("suppliers
    serving the same customers", "users touching the same items").

    The all-pairs product is NEVER materialized: pairs arise only
    through the wedge join (two nodes sharing a concrete neighbor), so
    the cost is Σ_w d(w)² over neighbor-side degrees — the same
    degree-quadratic bound as triangle counting. ``max_degree`` drops
    hub neighbors (a neighbor shared by everyone carries no signal and
    quadratic cost — the standard posting-list cap, same knob as the
    dedup family's ``max_df``), making the blow-up explicit and
    bounded. ``min_common`` prunes noise pairs before the degree join.

    Exactness: counts are integers; Jaccard is one int/int double
    division per pair. Canonical ``a < b`` ordering dedups pairs.

    Output: ``(a, b, n_common, deg_a, deg_b, jaccard)``.
    """
    from medallion_delta_lake_spark.operators.caching import (
        tracked_cache,
    )

    e = edges.select(
        F.col(node).alias("_n"), F.col(neighbor).alias("_w")
    ).distinct()
    deg_w = e.groupBy("_w").agg(F.count(F.lit(1)).alias("_dw"))
    # materialize once: three consumers (both wedge sides + degrees)
    # would otherwise each replay the scan+distinct+hub-filter
    # pipeline — audited at 19 exchanges uncached vs 7 cached
    kept = tracked_cache(
        e.join(
            F.broadcast(deg_w.filter(F.col("_dw") <= max_degree)),
            "_w",
        ).select("_n", "_w")
    )
    deg_n = kept.groupBy("_n").agg(F.count(F.lit(1)).alias("_dn"))
    lhs = kept.select(F.col("_n").alias("a"), "_w")
    rhs = kept.select(F.col("_n").alias("b"), "_w")
    common = (
        lhs.join(rhs, "_w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    da = deg_n.select(
        F.col("_n").alias("a"), F.col("_dn").alias("deg_a")
    )
    db = deg_n.select(
        F.col("_n").alias("b"), F.col("_dn").alias("deg_b")
    )
    # degree tables are per-node aggregates: small enough for AQE to
    # auto-broadcast on real dims, correctly shuffle-joined when the
    # node set itself is huge — no forced strategy
    out = common.join(da, "a").join(db, "b")
    union = F.col("deg_a") + F.col("deg_b") - F.col("n_common")
    return out.select(
        "a",
        "b",
        "n_common",
        "deg_a",
        "deg_b",
        (
            F.col("n_common").cast("double") / union.cast("double")
        ).alias("jaccard"),
    )


def basket_pairs(
    items: DataFrame,
    basket: str,
    item: str,
    max_basket_size: int = 64,
    min_pair_count: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Market-basket association rules with an EXPLICIT basket-size
    cap: co-occurring item pairs scored by support, confidence, and
    lift, top-``top_k`` by the integer pair count.

    Scale posture (VERDICT r10 fix): the pair self-join is keyed only
    on the basket id, so pair volume is Σ basket_size² — bounded only
    by the data's basket shape unless capped. ``max_basket_size``
    makes the bound explicit: baskets above it are EXCLUDED from the
    whole analysis (counts, supports, pairs), the standard
    posting-list cap (same knob as jaccard_neighbors' ``max_degree``
    and dedup's ``max_df``). The exclusion is never silent — run
    ``basket_cap_audit`` with the same cap for the dropped-basket
    census. The top-k is taken with ``orderBy().limit()`` — Spark
    plans TakeOrdered (each partition offers its local top-k, the
    driver merges k·partitions rows) — NOT a row_number over an
    unpartitioned window, which would sort every pair row in one
    partition. Ties break on (p1, p2) so the cut is deterministic.

    Output: ``(p1, p2, n_pair, support, confidence, lift)``.
    """
    from pyspark.sql import Window as W

    # ONE exchange feeds the whole pipeline: hash(o) satisfies the
    # ClusteredDistribution of the (o, p) dedup (partitioning exprs
    # are a subset of the grouping keys), of the per-basket window,
    # AND of the o-keyed self-join — measured 9 → 6 exchanges and
    # ~30% faster at sf0.1 vs distinct() minting its own (o, p)
    # exchange first
    op = (
        items.select(
            F.col(basket).alias("o"), F.col(item).alias("p")
        )
        .repartition("o")
        .dropDuplicates(["o", "p"])
    )
    sized = op.withColumn(
        "_bsz", F.count(F.lit(1)).over(W.partitionBy("o"))
    )
    kept = sized.filter(F.col("_bsz") <= max_basket_size).drop("_bsz")
    n = kept.agg(F.countDistinct("o").alias("n_orders"))
    ic = kept.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    top = pairs.orderBy(
        F.col("n_pair").desc(), "p1", "p2"
    ).limit(top_k)
    c1 = ic.select(F.col("p").alias("p1"), F.col("c").alias("c1"))
    c2 = ic.select(F.col("p").alias("p2"), F.col("c").alias("c2"))
    # the top-k frame is tiny by construction — broadcast it against
    # the item-count table rather than shuffling ic twice
    return (
        F.broadcast(top)
        .join(c1, "p1")
        .join(c2, "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "n_pair",
            (
                F.col("n_pair").cast("double")
                / F.col("n_orders").cast("double")
            ).alias("support"),
            (
                F.col("n_pair").cast("double")
                / F.col("c1").cast("double")
            ).alias("confidence"),
            (
                F.col("n_pair").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("c1").cast("double") * F.col("c2").cast("double"))
            ).alias("lift"),
        )
    )


def basket_cap_audit(
    items: DataFrame,
    basket: str,
    item: str,
    max_basket_size: int = 64,
) -> DataFrame:
    """Census of what ``basket_pairs``' cap excludes — (n_baskets,
    n_dropped, max_dropped_size): run alongside any capped
    association mine so truncation is visible, never silent. One
    grouped count over the distinct (basket, item) frame."""
    sz = (
        items.select(
            F.col(basket).alias("o"), F.col(item).alias("p")
        )
        .distinct()
        .groupBy("o")
        .agg(F.count(F.lit(1)).alias("bsz"))
    )
    return sz.agg(
        F.count(F.lit(1)).alias("n_baskets"),
        F.coalesce(
            F.sum(
                F.when(F.col("bsz") > max_basket_size, 1).otherwise(0)
            ),
            F.lit(0).cast("bigint"),
        ).alias("n_dropped"),
        F.max(
            F.when(F.col("bsz") > max_basket_size, F.col("bsz"))
        ).alias("max_dropped_size"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    iters: int = 3,
) -> DataFrame:
    """Synchronous min-label propagation over an undirected graph:
    every node starts labelled with its own id; each round it takes
    the minimum of its label and its neighbours' labels. Returns
    ``(id, lbl)`` after exactly ``iters`` rounds.

    Fixed-round propagation is the community/CC primitive that an
    oracle can unroll as a CTE chain (the same contract as
    :func:`pagerank`); for full connected-component convergence at
    100 TB use ``dedup.neardup_clusters_star`` (alternating
    large/small-star, O(log n) rounds) — this face is the bounded,
    deterministic k-hop form.

    Plan shape: the "keep your own label" term rides SELF-LOOP edges,
    so each round is ONE edges⋈labels equi-join + a map-side-combined
    MIN aggregate that references the previous label frame exactly
    once — the lineage stays LINEAR in the round count. (The naive
    ``least(own, min-neighbour)`` update references the label frame
    twice per round, doubling the unresolved plan each iteration —
     2^k recomputation by round k; self-loops are the same fix
    :func:`pagerank` gets from rebuilding off ``nodes``.) Shuffle
    width is |edges|+|V| rows of (id, lbl) pairs, no window, no
    collect."""
    from medallion_delta_lake_spark.operators.caching import tracked_cache

    half = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).distinct()
    nodes = (
        half.select(F.col("s").alias("id"))
        .unionByName(half.select(F.col("d").alias("id")))
        .distinct()
    )
    # duplicates from an input holding both (a,b) and (b,a) are
    # harmless under MIN — dedup only the raw half (the big frame)
    #
    # r15 optimization (guide §2.2 "fewer, larger map tasks"): without
    # an explicit repartition the cached 3-way-union frame materializes
    # at the union of its inputs' shuffle widths (~3×32 thin
    # partitions here), and cached plans keep their materialized width
    # (AQE does not re-coalesce them under the default
    # canChangeCachedPlanOutputPartitioning=false — see session.py),
    # so every round's edges⋈labels join re-reads the cache as dozens
    # of near-empty tasks and M×R tiny shuffle blocks. 16 even,
    # key-clustered partitions cut the per-round task count and block
    # count (the exact change graph-kcore-peel measured 6.6 → 2.6 s
    # from; this face measured 3.9 → 2.7 s). NOTE the per-round
    # exchange above the cache scan remains in the plan — the outer
    # planner cannot see a cached AdaptiveSparkPlan's output
    # partitioning — the win is partition/file-block arithmetic, not
    # exchange elimination. The count is size-derived (r16, ADVICE
    # r15): one ~100 MB cached partition per Catalyst-estimated byte
    # of the frame, floor 16 — sf0.1 estimates ~10 MiB so the benched
    # plan shape is unchanged, and a bigger graph raises the count
    # automatically instead of by comment.
    e_frame = half.unionByName(
        half.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).unionByName(
        nodes.select(F.col("id").alias("s"), F.col("id").alias("d"))
    )
    e = tracked_cache(
        e_frame.repartition(edge_cache_partitions(e_frame), "s")
    )
    lbl = nodes.withColumn("lbl", F.col("id"))
    for _ in range(iters):
        lbl = (
            e.join(lbl, e["s"] == lbl["id"])
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("lbl").alias("lbl"))
        )
    return lbl
