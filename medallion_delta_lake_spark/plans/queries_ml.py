"""Similarity-search + embedding-dedup query surface over the
``embeddings`` table (SURVEY.md §2.11), each with a DuckDB oracle.

Parity contract: cosine scores are sequential-fold double dot products
— bit-identical between Spark's ``aggregate`` and DuckDB's
``list_reduce`` (verified on the full table) — so rank boundaries and
threshold decisions agree exactly. LSH hyperplanes are deterministic
integer weights generated from the same constants on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import similarity as sim
from medallion_delta_lake_spark.plans.registry import query, table

_DIMS = 64
_PLANES = 6


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        f" z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),"
        f" (s, y) -> s + y)"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)} / nullif(sqrt({_dot_sql(a, a)})"
        f" * sqrt({_dot_sql(b, b)}), 0.0))"
    )


def _bucket_sql(vec: str) -> str:
    terms = []
    for p in range(_PLANES):
        w = "[" + ", ".join(str(x) for x in sim.hyperplane(p, _DIMS)) + "]"
        terms.append(
            f"CASE WHEN {_dot_sql(w, vec)} >= 0.0"
            f" THEN CAST({2**p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"


def _topk_oracle(query_pred: str, k: int) -> str:
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {_cos_sql('q.embedding', 'c.embedding')} AS cosine
      FROM embeddings q, embeddings c
      WHERE {query_pred}
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("sim-cosine-topk", oracle=_topk_oracle("q.vec_id = 0", 10))
def sim_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity / brute-force top-k — one query vector vs the corpus,
    exact cosine, ranked window. The correctness baseline for ANN."""
    e = table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(e.filter(F.col("vec_id") == 0), e, k=10)


@query("sim-knn-join", oracle=_topk_oracle("q.vec_id < 5", 5))
def sim_knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity / k-NN join — top-5 neighbors for each of 5 query
    vectors via broadcast cross join; the (qid, cid, score) window is
    the only shuffle."""
    e = table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(e.filter(F.col("vec_id") < 5), e, k=5)


_PROBES_SQL = "[bucket" + "".join(
    f", xor(bucket, {2**p})" for p in range(_PLANES)
) + "]"


@query(
    "sim-ann-lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    qp AS (
      SELECT vec_id, embedding, unnest({_PROBES_SQL}) AS bucket
      FROM b WHERE vec_id < 5
    ),
    scored AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id,
             {_cos_sql('q.embedding', 'c.embedding')} AS cosine
      FROM qp q JOIN b c ON q.bucket = c.bucket
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_ann_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity / ANN — random-hyperplane LSH buckets (6 planes) with
    one-bit multi-probe on the query side, bucket equi-join + exact
    rerank. Sub-quadratic scale path; recall measured vs brute force in
    tests/test_ann_recall.py, precision exact."""
    e = table(spark, sf_dir, "embeddings")
    return sim.ann_topk(
        e.filter(F.col("vec_id") < 5), e, k=5, n_planes=_PLANES,
        dims=_DIMS, multi_probe=True,
    )


_N_CENTROIDS = 16


@query(
    "sim-ann-ivf",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id < {_N_CENTROIDS}
    ),
    assign AS (
      SELECT e.vec_id, e.embedding, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_dot_sql('e.embedding', 'c.cv')} DESC, c.cid ASC
             ) AS rn
      FROM embeddings e CROSS JOIN cent c
    ),
    a2 AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
    probes AS (
      SELECT vec_id, embedding, cid FROM assign
      WHERE rn <= 4 AND vec_id < 5
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {_cos_sql('q.embedding', 'c.embedding')} AS cosine
      FROM probes q JOIN a2 c ON q.cid = c.cid
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_ann_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity / IVF ANN — deterministic coarse quantizer (first 16
    ids as centroids), MULTI-PROBE inverted-list scan (nprobe=4, the
    recommended recall/cost point: 0.85 recall vs 0.77 at nprobe=1,
    tests/test_ann_recall.py), exact rerank. Registered at nprobe=4 so
    the registry and bench exercise the multi-probe plan — the
    centroid ranking rides the broadcast query side; the probe stays
    one equi-join on the centroid id touching ~nprobe·N/16
    candidates (VERDICT r7 #8)."""
    e = table(spark, sf_dir, "embeddings")
    return sim.ivf_topk(
        e.filter(F.col("vec_id") < 5),
        e,
        k=5,
        n_centroids=_N_CENTROIDS,
        nprobe=4,
    )


_VD = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

_EMB_CORPUS_SQL = f"""
      SELECT vec_id, {_VD} AS embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 10000, {_VD} FROM embeddings WHERE vec_id % 10 = 0
      UNION ALL
      SELECT vec_id + 20000, list_transform({_VD}, x -> x * 2.0)
      FROM embeddings WHERE vec_id % 15 = 0
      UNION ALL
      SELECT vec_id + 30000,
             [({_VD})[1] + 0.5] || ({_VD})[2:{_DIMS}]
      FROM embeddings WHERE vec_id % 12 = 0
"""


def _emb_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with planted duplicates: exact copies, scaled copies
    (cosine 1), and one-element perturbations (cosine near but not at
    1) — the natural corpus has no near-dup pairs (max cosine 0.51)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double("embedding").alias("embedding")
    )
    exact = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    scaled = e.filter(F.col("vec_id") % 15 == 0).select(
        (F.col("vec_id") + 20000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    perturbed = e.filter(F.col("vec_id") % 12 == 0).select(
        (F.col("vec_id") + 30000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + 0.5),
            F.slice("embedding", 2, _DIMS - 1),
        ).alias("embedding"),
    )
    return e.unionByName(exact).unionByName(scaled).unionByName(perturbed)


@query(
    "dedup-embedding-cosine",
    oracle=f"""
    WITH corpus AS ({_EMB_CORPUS_SQL}),
    b AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM corpus
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             {_cos_sql('a.embedding', 'b2.embedding')} AS cosine
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.9
    """,
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / embedding cosine — near-dup pairs (cosine ≥ 0.9) found
    via hyperplane-bucket join + exact verification; the quadratic
    baseline exists in the operator (n_planes=None) but the registered
    scale path never cross-joins."""
    return sim.neardup_pairs(
        _emb_dup_corpus(spark, sf_dir),
        threshold=0.9,
        n_planes=_PLANES,
        dims=_DIMS,
        fan_out=spark.sparkContext.defaultParallelism,
    )


@query(
    "sim-ann-self-topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {_cos_sql('q.embedding', 'c.embedding')} AS cosine
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def sim_ann_self_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity / ANN self k-NN — top-3 same-bucket neighbors for
    every corpus vector (the kNN-graph builder); bucket equi-join with
    NO broadcast — the only tenable all-pairs shape at scale."""
    e = table(spark, sf_dir, "embeddings")
    return sim.ann_self_topk(e, k=3, n_planes=_PLANES, dims=_DIMS)


@query(
    "agg-vector-mean",
    # element-wise centroid per bucket of vec_id. Full-precision floats
    # cannot ride the decimal contract (the 12dp rounding itself
    # diverges between engines); instead the per-dim values are SORTED
    # and sequentially folded — identical element order + identical
    # IEEE adds = identical sums in both engines.
    oracle=f"""
    WITH e AS (
      SELECT vec_id % 4 AS grp, {_VD} AS v FROM embeddings
    ),
    pos AS (
      SELECT grp, i - 1 AS dim, v[i] AS x
      FROM e, unnest(range(1, {_DIMS} + 1)) AS r(i)
    )
    SELECT grp, CAST(dim AS INT) AS dim,
           list_reduce(list_prepend(0.0, list_sort(list(x))),
                       (s, y) -> s + y) / COUNT(*) AS mean_x
    FROM pos GROUP BY grp, dim
    """,
)
def agg_vector_mean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml / vector mean — element-wise group centroids (class
    prototypes / cluster summaries): posexplode to (group, dim, x)
    triples, decimal-exact per-dim mean. The same shape kmeans_centroids
    uses internally, exposed as a registry op in long form (one row per
    (group, dim) keeps the oracle schema-stable for any dims)."""
    e = table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 4).alias("grp"),
        sim.as_double("embedding").alias("v"),
    )
    pos = e.select("grp", F.posexplode("v").alias("dim", "x"))
    return pos.groupBy("grp", "dim").agg(
        (
            F.aggregate(
                F.array_sort(F.collect_list("x")),
                F.lit(0.0),
                lambda s, y: s + y,
            )
            / F.count(F.lit(1))
        ).alias("mean_x")
    )


@query(
    "vector-quantize-int8",
    # same fixed association as the engine: ((v-mn)/(mx-mn))*255.0,
    # then floor — IEEE-deterministic on identical doubles
    oracle="""
    WITH x AS (
      -- parallel unnests run in lockstep in DuckDB (positional zip)
      SELECT vec_id,
             CAST(unnest(embedding) AS DOUBLE) AS v,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings
    ),
    s AS (SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY pos),
    q AS (
      SELECT vec_id, x.pos,
             CAST(floor(CASE WHEN mx > mn
                             THEN ((v - mn) / (mx - mn)) * 255.0
                             ELSE 0.0 END) AS BIGINT) AS code
      FROM x JOIN s USING (pos)
    )
    SELECT vec_id,
           array_to_string(list(code ORDER BY pos), ',') AS codes
    FROM q GROUP BY vec_id
    """,
)
def vector_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vector / int8 scalar quantization — per-dimension corpus
    min/max → 0..255 codes, emitted as the comma-joined code string
    (driver-hashable scalar; see operators/similarity.quantize_int8)."""
    return sim.quantize_int8(
        table(spark, sf_dir, "embeddings"), "embedding", "vec_id"
    )


def _l2sq_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        f" z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))"
        f" * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))),"
        f" (s, y) -> s + y)"
    )


_PQ_M = 4
_PQ_K = 8
_PQ_D = _DIMS // _PQ_M


@query(
    "vector-quantize-pq",
    # fixed codebook = first k vectors' subvectors (same deterministic
    # contract as sim-ann-ivf); argmin per (vector, subspace) with cid
    # tie-break; dist is the sequential-fold squared L2 — engine-exact
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id < {_PQ_K}
    ),
    sub AS (SELECT CAST(range AS INT) AS subspace FROM range(0, {_PQ_M})),
    dists AS (
      SELECT e.vec_id, c.cid, s.subspace,
             {_l2sq_sql(
                 f"e.embedding[s.subspace*{_PQ_D}+1 : s.subspace*{_PQ_D}+{_PQ_D}]",
                 f"c.cv[s.subspace*{_PQ_D}+1 : s.subspace*{_PQ_D}+{_PQ_D}]",
             )} AS dist
      FROM embeddings e CROSS JOIN cent c CROSS JOIN sub s
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id, subspace ORDER BY dist ASC, cid ASC) AS rn
      FROM dists
    )
    SELECT vec_id, subspace, CAST(cid AS INT) AS code, dist
    FROM ranked WHERE rn = 1
    """,
)
def vector_quantize_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity / product quantization — per-subspace nearest-
    codebook-centroid codes (64 floats → 4 codes): the ANN-index
    compression step between int8 scalar quantization and IVF.
    Broadcast codebook NLJ + partial-aggregating argmin; shuffle
    carries (id, subspace, dist, cid) rows only, never vectors."""
    return sim.pq_codes(
        table(spark, sf_dir, "embeddings"),
        dims=_DIMS,
        m=_PQ_M,
        k=_PQ_K,
    )


@query(
    "sim-pq-adc-topk",
    # search side of PQ: per-query subspace-distance lookup table over
    # the codebook, candidate distance = sum of m lookups on its codes.
    # The sum accumulates in DECIMAL(38,6) (order-independent) and rank
    # ties break on vec_id — engine-exact.
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id < {_PQ_K}
    ),
    sub AS (SELECT CAST(range AS INT) AS subspace FROM range(0, {_PQ_M})),
    dists AS (
      SELECT e.vec_id, c.cid, s.subspace,
             {_l2sq_sql(
                 f"e.embedding[s.subspace*{_PQ_D}+1 : s.subspace*{_PQ_D}+{_PQ_D}]",
                 f"c.cv[s.subspace*{_PQ_D}+1 : s.subspace*{_PQ_D}+{_PQ_D}]",
             )} AS dist
      FROM embeddings e CROSS JOIN cent c CROSS JOIN sub s
    ),
    codes AS (
      SELECT vec_id AS cand_id, subspace, cid AS code FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id, subspace ORDER BY dist ASC, cid ASC) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, cid AS code_match, subspace,
             dist AS qdist
      FROM dists WHERE vec_id < 5
    ),
    scored AS (
      SELECT l.query_id, c.cand_id,
             CAST(SUM(CAST(l.qdist AS DECIMAL(38,6))) AS DOUBLE)
               AS adc_dist
      FROM codes c
      JOIN lut l ON l.subspace = c.subspace AND l.code_match = c.code
      GROUP BY l.query_id, c.cand_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_dist ASC, cand_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, cand_id AS vec_id, adc_dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity / PQ asymmetric-distance top-k — the ANN query path
    over the compressed index: m table lookups per candidate instead
    of a d-dimensional distance; broadcast LUT equi-join + grouped
    decimal sum + ranked window. Full-precision vectors touched only
    on the tiny query side."""
    return sim.pq_adc_topk(
        table(spark, sf_dir, "embeddings"),
        dims=_DIMS,
        m=_PQ_M,
        k_cent=_PQ_K,
        n_queries=5,
        k=5,
    )


_BAL_K = 8


@query(
    "cluster-balance-stats",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id < {_BAL_K}
    ),
    assign AS (
      SELECT e.vec_id, c.cid,
             {_dot_sql('e.embedding', 'c.cv')} AS dotp,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_dot_sql('e.embedding', 'c.cv')} DESC, c.cid ASC
             ) AS rn
      FROM embeddings e CROSS JOIN cent c
    )
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(dotp AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
             AS mean_dot
    FROM assign WHERE rn = 1 GROUP BY cid
    """,
)
def cluster_balance_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clustering / balance diagnostics — corpus partitioned by its
    deterministic coarse quantizer (first 8 ids as centroids, argmax
    dot), reporting per-cluster size and mean affinity: the skew check
    run before sharding a corpus by semantic cluster (a 90 %-in-one-
    cluster corpus needs re-fit before cluster-parallel processing).
    Assignment is the broadcast-NLJ + struct-min partial agg of
    ivf_assign — shuffle carries one row per vector."""
    e = table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < _BAL_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    assigned = sim.ivf_assign(e, F.broadcast(cent))
    dotp = sim.dot(
        sim.as_double("embedding"), sim.as_double("cv")
    )
    scored = assigned.join(F.broadcast(cent), "cid").select(
        "cid", dotp.alias("dotp")
    )
    return scored.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum(F.col("dotp").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_dot"),
    )


@query(
    "sim-centroid-outliers",
    # per-label centroid from 1e-6-quantized integer sums (order-free);
    # squared distances quantized floor(d^2*1e12) per dim so the 64-dim
    # reduction is an exact integer sum (k=64 > the ordered-window k<=17
    # rule); top-3 per label
    oracle=f"""
    WITH idx AS (SELECT CAST(range AS INT) + 1 AS i FROM range({_DIMS})),
    q AS (
      SELECT vec_id, label, idx.i,
             CAST(embedding[idx.i] AS DOUBLE) AS val,
             CAST(floor(CAST(embedding[idx.i] AS DOUBLE) * 1e6)
                  AS BIGINT) AS qi
      FROM embeddings, idx
    ),
    c AS (
      SELECT label, i, CAST(SUM(qi) AS BIGINT) AS si, COUNT(*) AS n
      FROM q GROUP BY label, i
    ),
    d AS (
      SELECT q.vec_id, q.label,
             CAST(floor(
               (q.val - ((CAST(c.si AS DOUBLE) / CAST(c.n AS DOUBLE))
                         / 1e6))
               * (q.val - ((CAST(c.si AS DOUBLE) / CAST(c.n AS DOUBLE))
                           / 1e6))
               * 1e12) AS BIGINT) AS dq
      FROM q JOIN c ON q.label = c.label AND q.i = c.i
    ),
    s AS (
      SELECT vec_id, label, CAST(SUM(dq) AS BIGINT) AS d2q
      FROM d GROUP BY vec_id, label
    ),
    r AS (
      SELECT label, vec_id, d2q,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY d2q DESC, vec_id) AS rank
      FROM s
    )
    SELECT label, vec_id, CAST(d2q AS DOUBLE) / 1e12 AS dist2,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def sim_centroid_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity / embedding-outlier census — per label, the 3 vectors
    farthest from the label centroid (the embedding-space quality
    filter: mislabeled / off-distribution training docs surface here).
    Centroids reduce from 1e-6-quantized integer sums keyed
    (label, dim) — order-free and fully distributed; per-dim squared
    gaps are floor-quantized to integers so the 64-term distance
    reduction is exact under any partitioning (the registry rule for
    k > 17). Shapes: explode is map-side; both aggregates and the
    rank window shuffle on small keys."""
    e = table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "fval"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("i"),
        F.col("fval").cast("double").alias("val"),
    ).withColumn(
        "qi", F.floor(F.col("val") * F.lit(1e6)).cast("bigint")
    )
    c = q.groupBy("label", "i").agg(
        F.sum("qi").cast("bigint").alias("si"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = (
        F.col("si").cast("double") / F.col("n").cast("double")
    ) / F.lit(1e6)
    d = q.join(c, ["label", "i"]).select(
        "vec_id",
        "label",
        F.floor(
            (F.col("val") - cent)
            * (F.col("val") - cent)
            * F.lit(1e12)
        )
        .cast("bigint")
        .alias("dq"),
    )
    s = d.groupBy("vec_id", "label").agg(
        F.sum("dq").cast("bigint").alias("d2q")
    )
    from pyspark.sql import Window as W

    r = s.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("label").orderBy(
                F.col("d2q").desc(), F.col("vec_id")
            )
        ),
    ).filter(F.col("rank") <= 3)
    return r.select(
        "label",
        "vec_id",
        (F.col("d2q").cast("double") / F.lit(1e12)).alias("dist2"),
        F.col("rank").cast("int").alias("rank"),
    )
