"""Model-evaluation query surface (SURVEY.md §2.11 extension —
round 9): ROC-AUC, gains/lift, precision@k, Brier, confusion grid,
NDCG@10, Holt smoothing, Poisson-bootstrap CI. Each op registers a
DuckDB oracle built from the SAME integer constants / shared-spelling
closes as the Spark plan (registry float-determinism contract).

Label convention: y = 1 for 'purchase' events, score = the 2-decimal
``value`` column integerized to cents — a deterministic stand-in for a
model score against a binary outcome, which is exactly the shape the
metrics consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import mleval
from medallion_delta_lake_spark.operators.agg import limb_double_sql
from medallion_delta_lake_spark.operators.pandas_ops import holt_linear
from medallion_delta_lake_spark.plans.registry import query, table

_BASE_SQL = """
      SELECT event_id, user_id,
             CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
"""

# dense global rank by (score desc, event_id) from the distinct-cents
# frequency map — shared by the lift / p@k oracles
_RANK_SQL = f"""
    base AS ({_BASE_SQL}),
    f AS (SELECT v, COUNT(*) AS n FROM base GROUP BY v),
    off AS (
      SELECT v, COALESCE(SUM(n) OVER (ORDER BY v DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS c_before
      FROM f
    ),
    tot AS (SELECT COUNT(*) AS big_n FROM base),
    rk AS (
      SELECT b.y, b.v,
             off.c_before + ROW_NUMBER() OVER (
               PARTITION BY b.v ORDER BY b.event_id) AS r,
             tot.big_n
      FROM base b JOIN off ON b.v = off.v, tot
    )
"""


def _label_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("event_type") == "purchase")
        .cast("int")
        .alias("label"),
    )


_AUC_NUM = limb_double_sql(
    "r2 - CAST(p AS DECIMAL(38,0)) * (p + 1)"
)
_AUC_EXPR = (
    f"({_AUC_NUM} / (2.0 * CAST(p AS DOUBLE) * CAST(q AS DOUBLE)))"
)


@query(
    "ml-roc-auc",
    # tie-aware Mann-Whitney rank-sum identity on the distinct-cents
    # frequency map: doubled midranks are integers, 2R+ accumulates in
    # DECIMAL(38,0), one limb close / 2 n+ n-
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    f AS (SELECT v, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS np
          FROM base GROUP BY v),
    r AS (
      SELECT n, np,
             2 * COALESCE(SUM(n) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) + n + 1 AS d
      FROM f
    ),
    t AS (
      SELECT SUM(CAST(np AS DECIMAL(38,0)) * d) AS r2,
             CAST(SUM(np) AS BIGINT) AS p,
             CAST(SUM(n) - SUM(np) AS BIGINT) AS q
      FROM r
    )
    SELECT p AS n_pos, q AS n_neg,
           {_AUC_EXPR} AS auc,
           (2.0 * {_AUC_EXPR} - 1.0) AS gini
    FROM t
    """,
)
def ml_roc_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml eval / exact ROC-AUC — discrimination of the value score for
    'purchase', via the rank-sum identity with midrank tie handling.
    No fact sort: ranks come from the bounded-distinct frequency map
    (operators/mleval.py:roc_auc), so the plan is two grouped
    aggregates plus a tiny ordered window over distinct cents."""
    return mleval.roc_auc(
        _label_events(spark, sf_dir), "value", "label"
    )


@query(
    "ml-lift-deciles",
    # arithmetic decile cut ((r-1)*10 div N) — NOT NTILE, whose
    # remainder placement is engine lore; integer cells, double closes
    oracle=f"""
    WITH {_RANK_SQL},
    d AS (SELECT ((r - 1) * 10) // big_n AS decile_0, y, big_n FROM rk),
    g AS (
      SELECT decile_0, big_n, COUNT(*) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM d GROUP BY decile_0, big_n
    ),
    p AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS p FROM g),
    cum AS (
      SELECT g.decile_0, g.big_n, g.n, g.n_pos, p.p,
             CAST(SUM(n_pos) OVER (ORDER BY decile_0
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_pos
      FROM g, p
    )
    SELECT CAST(decile_0 + 1 AS BIGINT) AS decile, n, n_pos,
           ((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(p AS DOUBLE) / CAST(big_n AS DOUBLE))) AS lift,
           (CAST(cum_pos AS DOUBLE) / CAST(p AS DOUBLE)) AS cum_capture
    FROM cum
    """,
)
def ml_lift_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml eval / gains & lift table — rank by score desc, cut into 10
    arithmetic deciles, per-decile positive lift vs base rate and
    cumulative capture (the campaign-targeting readout). Global rank
    without a global sort: distinct-cents offsets + per-tie
    ROW_NUMBER partitioned by score (operators/mleval.py)."""
    return mleval.lift_deciles(
        _label_events(spark, sf_dir), "value", "label"
    )


_KS = [10, 50, 100, 500, 1000, 5000]


@query(
    "ml-pr-at-k",
    # broadcast k-ladder fan-out over the rank frame; integer cells
    oracle=f"""
    WITH {_RANK_SQL},
    kf AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES
           {", ".join(f"({k})" for k in _KS)}) t(k)),
    tot2 AS (SELECT CAST(SUM(y) AS BIGINT) AS p FROM base),
    j AS (SELECT kf.k, rk.y FROM rk, kf WHERE rk.r <= kf.k)
    SELECT j.k, COUNT(*) AS n_at_k, CAST(SUM(y) AS BIGINT) AS tp,
           (CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             AS "precision",
           (CAST(SUM(y) AS DOUBLE) / CAST(MAX(tot2.p) AS DOUBLE))
             AS recall
    FROM j, tot2 GROUP BY j.k
    """,
)
def ml_pr_at_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml eval / precision@k + recall@k ladder — one rank pass, a
    broadcast 6-row cutoff frame, integer conditional sums; n_at_k
    degrades gracefully when k exceeds the table
    (operators/mleval.py:precision_recall_at_k)."""
    return mleval.precision_recall_at_k(
        _label_events(spark, sf_dir), "value", "label", _KS
    )


_BRIER_LIMB = limb_double_sql("se")


@query(
    "ml-brier-score",
    # (s-y)^2 = (v - y*gmax)^2 / gmax^2 keeps the reduction integral;
    # DECIMAL(38,0) sum + limb close
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    g AS (SELECT MAX(v) AS gmax FROM base),
    s AS (
      SELECT CAST(CAST(b.v - b.y * g.gmax AS DECIMAL(19,0))
                  * (b.v - b.y * g.gmax) AS DECIMAL(38,0)) AS e2,
             b.y, g.gmax
      FROM base b, g
    ),
    t AS (
      SELECT gmax, SUM(e2) AS se, COUNT(*) AS n,
             CAST(SUM(y) AS BIGINT) AS p
      FROM s GROUP BY gmax
    )
    SELECT n,
           ({_BRIER_LIMB} / (CAST(n AS DOUBLE)
              * (CAST(gmax AS DOUBLE) * CAST(gmax AS DOUBLE))))
             AS brier,
           (CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) AS base_rate,
           (1.0 - ({_BRIER_LIMB} / (CAST(n AS DOUBLE)
              * (CAST(gmax AS DOUBLE) * CAST(gmax AS DOUBLE))))
            / ((CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
               * (1.0 - (CAST(p AS DOUBLE) / CAST(n AS DOUBLE)))))
             AS brier_skill
    FROM t
    """,
)
def ml_brier_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml eval / Brier score + skill vs climatology — calibration
    error of the max-normalized score, computed from integer squared
    residuals so the reduction is exact at any scale
    (operators/mleval.py:brier_score)."""
    return mleval.brier_score(
        _label_events(spark, sf_dir), "value", "label"
    )


@query(
    "ml-confusion-threshold",
    # integer quarter-point thresholds of the observed range; 2x2
    # cells are conditional integer sums, metrics close from cells
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    g AS (SELECT MAX(v) AS gmax FROM base),
    qf AS (SELECT CAST(q AS INT) AS q FROM (VALUES (1),(2),(3)) t(q)),
    j AS (
      SELECT qf.q,
             CASE WHEN b.v >= (qf.q * g.gmax) // 4 THEN 1 ELSE 0 END
               AS pred,
             b.y
      FROM base b, g, qf
    ),
    cells AS (
      SELECT q,
             CAST(SUM(pred * y) AS BIGINT) AS tp,
             CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp,
             CAST(SUM((1 - pred) * y) AS BIGINT) AS fn,
             CAST(SUM((1 - pred) * (1 - y)) AS BIGINT) AS tn
      FROM j GROUP BY q
    )
    SELECT q, tp, fp, fn, tn,
           ((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE))
            / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
               + CAST(fn AS DOUBLE) + CAST(tn AS DOUBLE)))
             AS accuracy,
           (CAST(tp AS DOUBLE)
            / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)))
             AS "precision",
           (CAST(tp AS DOUBLE)
            / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)))
             AS recall,
           (2.0 * CAST(tp AS DOUBLE)
            / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
               + CAST(fn AS DOUBLE)))
             AS f1
    FROM cells
    """,
)
def ml_confusion_threshold_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ml eval / thresholded confusion grid — TP/FP/FN/TN plus
    accuracy, precision, recall, F1 at the quarter points of the
    observed score range; one scan, broadcast threshold frame
    (operators/mleval.py:confusion_at_thresholds)."""
    return mleval.confusion_at_thresholds(
        _label_events(spark, sf_dir), "value", "label"
    )


_DISC_CASE = "CASE r " + " ".join(
    f"WHEN {r} THEN {d}"
    for r, d in enumerate(mleval.NDCG_DISC, start=1)
) + " END"
_DISC_CASE_J = _DISC_CASE.replace("CASE r ", "CASE j ")


@query(
    "ml-ndcg-at-k",
    # integer discount table baked from ONE host log2 evaluation —
    # libm never runs in-engine; DCG/IDCG are exact BIGINT sums
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    rk AS (
      SELECT user_id, y,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY v DESC, event_id) AS r
      FROM base
    ),
    dcg AS (
      SELECT user_id,
             CAST(SUM(y * ({_DISC_CASE})) AS BIGINT) AS dcg_i
      FROM rk WHERE r <= {mleval.NDCG_K} GROUP BY user_id
    ),
    pos AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY event_id) AS j
      FROM base WHERE y = 1
    ),
    idcg AS (
      SELECT user_id,
             CAST(SUM({_DISC_CASE_J}) AS BIGINT) AS idcg_i
      FROM pos WHERE j <= {mleval.NDCG_K} GROUP BY user_id
    )
    SELECT d.user_id, d.dcg_i, i.idcg_i,
           (CAST(d.dcg_i AS DOUBLE) / CAST(i.idcg_i AS DOUBLE))
             AS ndcg
    FROM dcg d JOIN idcg i ON d.user_id = i.user_id
    """,
)
def ml_ndcg_at_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml eval / per-user NDCG@10 — ranking quality of the score
    against purchase relevance, with the log2 discount table baked to
    integers at import (no in-engine libm). Every window partitions
    on the user key — fully distributed
    (operators/mleval.py:ndcg_at_k)."""
    return mleval.ndcg_at_k(
        _label_events(spark, sf_dir), "value", "label", "user_id"
    )


@query(
    "ts-holt-linear",
    # genuinely-sequential smoothing: applyInPandas per series vs a
    # recursive-CTE oracle spelling the identical IEEE recurrence;
    # alpha=beta=1/2 are exact binary scalings
    oracle="""
    WITH RECURSIVE h0 AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(round(CAST(value AS DOUBLE) * 100, 0)
                  AS BIGINT)) AS BIGINT) AS sc,
             COUNT(*) AS cn
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    h AS (
      SELECT user_id,
             (CAST(sc AS DOUBLE) / CAST(cn AS DOUBLE)) / 100.0 AS x,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY hr) AS BIGINT) AS step
      FROM h0
    ),
    rec AS (
      SELECT user_id, step, x, x AS "level",
             CAST(0.0 AS DOUBLE) AS trend
      FROM h WHERE step = 1
      UNION ALL
      SELECT h.user_id, h.step, h.x,
             0.5 * h.x + 0.5 * (rec."level" + rec.trend) AS "level",
             0.5 * ((0.5 * h.x + 0.5 * (rec."level" + rec.trend))
                    - rec."level") + 0.5 * rec.trend AS trend
      FROM rec JOIN h
        ON h.user_id = rec.user_id AND h.step = rec.step + 1
    )
    SELECT user_id, step, x, "level", trend FROM rec
    """,
)
def ts_holt_linear_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts / Holt double-exponential smoothing per user over hourly
    means — the canonical sequential-state operator: no window/agg
    composition expresses it, so it runs as a partition-stream
    ``mapInPandas`` (operators/pandas_ops.py:holt_linear), one
    shuffle on the series key. Hourly means reduce from integer cents
    (exact); α=β=½ keep the float recursion bit-identical to the
    recursive-CTE oracle."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    h0 = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.sum(mleval.cents(F.col("value"))).alias("sc"),
        F.count(F.lit(1)).alias("cn"),
    )
    h = h0.select(
        "user_id",
        (
            (F.col("sc").cast("double") / F.col("cn").cast("double"))
            / 100.0
        ).alias("x"),
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("hr"))
        .cast("bigint")
        .alias("step"),
    )
    return holt_linear(h, "user_id", "step", "x")


_BOOT_MEAN = limb_double_sql("num")
_BOOT_PT = limb_double_sql("SUM(CAST(v AS DECIMAL(38,0)))")
_W_CASE = " + ".join(
    f"CASE WHEN u6 >= {c} THEN 1 ELSE 0 END"
    for c in mleval.POISSON1_CDF6
)


def _boot_params_sql(b: int) -> str:
    from medallion_delta_lake_spark.functions.hashing import (
        minhash_params,
    )

    rows = ", ".join(
        f"({i}, {a}, {c})"
        for i, (a, c) in enumerate(minhash_params(b))
    )
    return (
        f"SELECT CAST(b AS BIGINT) AS b, CAST(a AS BIGINT) AS a,"
        f" CAST(c AS BIGINT) AS c FROM (VALUES {rows}) t(b, a, c)"
    )


@query(
    "agg-bootstrap-poisson-ci",
    # hash-seeded Poisson(1) resample weights (ONE portable md5 h64
    # per row, universal-hash mix per replicate, inverse-CDF
    # thresholds baked to 1e-6 integers); replicate means close via
    # DECIMAL numerators + limb; CI = order statistics of the 100
    # replicate means
    oracle=f"""
    WITH base AS (
      SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
               1, 15)) AS BIGINT) % {1_073_741_789} AS h,
             CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    bs AS ({_boot_params_sql(100)}),
    rep0 AS (
      SELECT bs.b, base.v,
             (((bs.a * base.h + bs.c) % {1_073_741_789}) * 1000000)
               // {1_073_741_789} AS u6
      FROM base, bs
    ),
    wt AS (SELECT b, v, ({_W_CASE}) AS w FROM rep0),
    rep AS (
      SELECT b, SUM(CAST(v AS DECIMAL(38,0)) * w) AS num,
             CAST(SUM(w) AS BIGINT) AS den
      FROM wt GROUP BY b
    ),
    m AS (
      SELECT b, (({_BOOT_MEAN} / CAST(den AS DOUBLE)) / 100.0)
               AS mean_b
      FROM rep
    ),
    r AS (
      SELECT mean_b,
             ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn
      FROM m
    ),
    pt AS (
      SELECT COUNT(*) AS n,
             (({_BOOT_PT} / CAST(COUNT(*) AS DOUBLE)) / 100.0)
               AS point_mean
      FROM base
    )
    SELECT pt.n, pt.point_mean, lo.mean_b AS ci_lo,
           hi.mean_b AS ci_hi, CAST(100 AS BIGINT) AS n_replicates
    FROM pt,
         (SELECT mean_b FROM r WHERE rn = 3) lo,
         (SELECT mean_b FROM r WHERE rn = 98) hi
    """,
)
def agg_bootstrap_poisson_ci_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """agg / Poisson-bootstrap 95% CI for the mean — the bootstrap
    that survives 100 TB: per-replicate Poisson(1) weights are a
    map-side hash expression (no resample materialization; the only
    shuffle is B=100 partial-aggregate rows per task), replicate
    means reduce exactly in DECIMAL, the CI is an order statistic of
    100 doubles (operators/mleval.py:poisson_bootstrap_mean_ci)."""
    ev = table(spark, sf_dir, "events")
    return mleval.poisson_bootstrap_mean_ci(
        ev, "value", "event_id", b=100
    )


_GAUC_NUM = limb_double_sql("r2 - CAST(p AS DECIMAL(38,0)) * (p + 1)")
_GAUC_EXPR = (
    f"({_GAUC_NUM} / (2.0 * CAST(p AS DOUBLE) * CAST(q AS DOUBLE)))"
)


@query(
    "ml-group-auc",
    # the fully-distributed AUC: frequency map keyed (segment, cents),
    # every window partitioned on the segment — no global anything
    oracle=f"""
    WITH base AS (
      SELECT user_id % 5 AS cohort,
             CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    f AS (
      SELECT cohort, v, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS np
      FROM base GROUP BY cohort, v
    ),
    r AS (
      SELECT cohort, n, np,
             2 * COALESCE(SUM(n) OVER (PARTITION BY cohort ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) + n + 1 AS d
      FROM f
    ),
    t AS (
      SELECT cohort,
             SUM(CAST(np AS DECIMAL(38,0)) * d) AS r2,
             CAST(SUM(np) AS BIGINT) AS p,
             CAST(SUM(n) - SUM(np) AS BIGINT) AS q
      FROM r GROUP BY cohort
    )
    SELECT cohort, p AS n_pos, q AS n_neg, {_GAUC_EXPR} AS auc
    FROM t WHERE p > 0 AND q > 0
    """,
)
def ml_group_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml eval / per-segment ROC-AUC — the form that scales to a
    million segments: frequency map keyed (cohort, cents), windows
    partitioned on the cohort, per-cohort DECIMAL rank sums + limb
    close (operators/mleval.py:grouped_roc_auc). Cohort here is a
    deterministic user hash bucket."""
    ev = table(spark, sf_dir, "events")
    df = ev.select(
        (F.col("user_id") % 5).alias("cohort"),
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return mleval.grouped_roc_auc(df, "value", "label", "cohort")


@query(
    "ml-ks-separation",
    # integer empirical CDFs over the distinct-cents frame; the close
    # is MAX/argmax — comparisons, never an order-sensitive sum
    oracle="""
    WITH base AS (
      SELECT CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    f AS (
      SELECT v, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS np
      FROM base GROUP BY v
    ),
    tot AS (
      SELECT CAST(SUM(np) AS BIGINT) AS p,
             CAST(SUM(n) - SUM(np) AS BIGINT) AS q
      FROM f
    ),
    c AS (
      SELECT v,
             CAST(SUM(np) OVER w AS BIGINT) AS cp,
             CAST(SUM(n) OVER w - SUM(np) OVER w AS BIGINT) AS cn
      FROM f
      WINDOW w AS (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    d AS (
      SELECT v, tot.p, tot.q,
             ABS(CAST(cp AS DOUBLE) / CAST(tot.p AS DOUBLE)
                 - CAST(cn AS DOUBLE) / CAST(tot.q AS DOUBLE)) AS d
      FROM c, tot
    ),
    r AS (
      SELECT v, p, q, d,
             ROW_NUMBER() OVER (ORDER BY d DESC, v) AS rn
      FROM d
    )
    SELECT d AS ks_stat, v AS at_score_cents, p AS n_pos, q AS n_neg
    FROM r WHERE rn = 1
    """,
)
def ml_ks_separation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml eval / KS separation (the credit-scoring KS statistic) —
    max gap between the positive and negative score CDFs. Integer
    cumulative counts over distinct cents; the close is a max/argmax,
    structurally immune to reduction-order effects
    (operators/mleval.py:ks_separation)."""
    return mleval.ks_separation(
        _label_events(spark, sf_dir), "value", "label"
    )


_PT_D1 = limb_double_sql("s1")
_PT_D0 = limb_double_sql("s - s1")
_PT_SA = limb_double_sql("sa")
_PT_SB = limb_double_sql("st - sa")
_PT_P = 1_073_741_789


@query(
    "stats-permutation-test",
    # hash-seeded randomization test: Bernoulli(n1/n) pseudo-groups
    # per replicate from one md5 + universal-hash mix; DECIMAL group
    # sums + limb closes; the p-value is a COUNT of comparisons
    oracle=f"""
    WITH base AS (
      SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
               1, 15)) AS BIGINT) % {_PT_P} AS h,
             CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    tot AS (
      SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n1,
             SUM(CAST(v AS DECIMAL(38,0)) * y) AS s1,
             SUM(CAST(v AS DECIMAL(38,0))) AS s
      FROM base
    ),
    obs AS (
      SELECT n, n1, CAST(n - n1 AS BIGINT) AS n0,
             (({_PT_D1} / CAST(n1 AS DOUBLE)
               - {_PT_D0} / CAST(n - n1 AS DOUBLE)) / 100.0)
               AS diff_obs,
             (n1 * 1000000) // n AS t6
      FROM tot
    ),
    bs AS ({{BOOT}}),
    asn AS (
      SELECT bs.b, base.v,
             CASE WHEN (((bs.a * base.h + bs.c) % {_PT_P}) * 1000000)
                       // {_PT_P} < obs.t6
                  THEN 1 ELSE 0 END AS g
      FROM base, bs, obs
    ),
    rep0 AS (
      SELECT b,
             SUM(CAST(v AS DECIMAL(38,0)) * g) AS sa,
             CAST(SUM(g) AS BIGINT) AS na,
             SUM(CAST(v AS DECIMAL(38,0))) AS st,
             COUNT(*) AS nt
      FROM asn GROUP BY b
    ),
    rep AS (
      SELECT b,
             (({_PT_SA} / CAST(na AS DOUBLE)
               - {_PT_SB} / CAST(nt - na AS DOUBLE)) / 100.0)
               AS diff_b
      FROM rep0 WHERE na > 0 AND na < nt
    ),
    cnt AS (
      SELECT COUNT(*) AS n_rep,
             CAST(SUM(CASE WHEN abs(rep.diff_b) >= abs(obs.diff_obs)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
      FROM rep, obs
    )
    SELECT obs.n1 AS n_treat, obs.n0 AS n_control, obs.diff_obs,
           (CAST(cnt.n_ge + 1 AS DOUBLE)
            / CAST(cnt.n_rep + 1 AS DOUBLE)) AS p_value,
           CAST(cnt.n_rep AS BIGINT) AS n_replicates
    FROM obs, cnt
    """.replace("{BOOT}", _boot_params_sql(100)),
)
def stats_permutation_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats / randomization (permutation) test — is the purchase-
    event mean value different from everything else, without any
    distributional assumption? B=100 hash-seeded Bernoulli(n1/n)
    pseudo-relabelings (the at-scale approximation of an exact
    permutation), DECIMAL-exact group sums, and a p-value that closes
    as a comparison COUNT with the +1 correction — no float ever
    reduces across rows (operators/mleval.py:
    permutation_test_mean_diff)."""
    ev = table(spark, sf_dir, "events")
    df = ev.select(
        "event_id",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return mleval.permutation_test_mean_diff(
        df, "value", "event_id", "label", b=100
    )


@query(
    "stats-cohens-kappa",
    # inter-rater agreement between two deterministic binary raters:
    # integer 2x2 contingency, kappa closes from the four cells in
    # one shared IEEE chain
    oracle="""
    WITH base AS (
      SELECT CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT)
               AS v,
             CASE WHEN event_type IN ('purchase', 'click')
                  THEN 1 ELSE 0 END AS rb
      FROM events WHERE value IS NOT NULL
    ),
    med AS (
      SELECT v AS m FROM (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v, rb) AS rn,
               COUNT(*) OVER () AS n
        FROM base
      ) WHERE rn = (n + 1) // 2
    ),
    lab AS (
      SELECT CASE WHEN base.v >= med.m THEN 1 ELSE 0 END AS ra, rb
      FROM base, med
    ),
    cells AS (
      SELECT CAST(SUM(ra * rb) AS BIGINT) AS a,
             CAST(SUM(ra * (1 - rb)) AS BIGINT) AS b,
             CAST(SUM((1 - ra) * rb) AS BIGINT) AS c,
             CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS d
      FROM lab
    )
    SELECT a, b, c, d,
           (CAST(a + d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE))
             AS p_obs,
           ((CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
             + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE))
            / (CAST(a + b + c + d AS DOUBLE)
               * CAST(a + b + c + d AS DOUBLE))) AS p_exp,
           (((CAST(a + d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE))
             - ((CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                 + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE))
                / (CAST(a + b + c + d AS DOUBLE)
                   * CAST(a + b + c + d AS DOUBLE))))
            / (1.0
               - ((CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                   + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE))
                  / (CAST(a + b + c + d AS DOUBLE)
                     * CAST(a + b + c + d AS DOUBLE))))) AS kappa
    FROM cells
    """,
)
def stats_cohens_kappa_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats / Cohen's kappa — chance-corrected agreement between two
    binary raters (here two deterministic labelers: value >= corpus
    median, and the engagement event-type class — the label-quality
    audit shape used when double-annotating training data). The 2x2
    contingency is pure integer sums off a positional median; kappa
    closes from the four cells in one fully-parenthesized shared
    chain."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    base = ev.select(
        F.round(F.col("value").cast("double") * 100, 0)
        .cast("bigint")
        .alias("v"),
        F.col("event_type")
        .isin("purchase", "click")
        .cast("int")
        .alias("rb"),
    )
    wr = W.orderBy("v", "rb")
    med = (
        base.select(
            "v",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(
                W.rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            ).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("v").alias("m"))
    )
    lab = base.crossJoin(F.broadcast(med)).select(
        (F.col("v") >= F.col("m")).cast("int").alias("ra"), "rb"
    )
    cells = lab.groupBy().agg(
        F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("a"),
        F.sum(F.col("ra") * (1 - F.col("rb")))
        .cast("bigint")
        .alias("b"),
        F.sum((1 - F.col("ra")) * F.col("rb"))
        .cast("bigint")
        .alias("c"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("bigint")
        .alias("d"),
    )
    a, b, c, d = (F.col(x).cast("double") for x in "abcd")
    tot = a + b + c + d
    p_obs = (a + d) / tot
    p_exp = ((a + b) * (a + c) + (c + d) * (b + d)) / (tot * tot)
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        p_obs.alias("p_obs"),
        p_exp.alias("p_exp"),
        ((p_obs - p_exp) / (1.0 - p_exp)).alias("kappa"),
    )


@query(
    "ml-expected-calibration-error",
    # ECE over the reliability bins: per-bin |pos_rate - avg_score|
    # terms are nonnegative doubles from the SAME integer cores as
    # ml-calibration-bins; the 10-term reduction runs in an ordered
    # window (k <= 17 rule) closed by MAX
    oracle="""
    WITH g AS (
      SELECT MAX(value) AS gmax FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS y,
             LEAST(CAST(floor((value / gmax) * 10) AS BIGINT), 9)
               AS bin,
             CAST(floor((value / gmax) * 1e12) AS BIGINT) AS si
      FROM events, g WHERE value IS NOT NULL
    ),
    b AS (
      SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS np,
             SUM(si) AS ssi
      FROM s GROUP BY bin
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM b),
    term AS (
      SELECT bin, t.big_n,
             (CAST(n AS DOUBLE) / CAST(t.big_n AS DOUBLE))
               * ABS(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
                     - CAST(ssi AS DOUBLE)
                       / (CAST(n AS DOUBLE) * 1e12)) AS term
      FROM b, t
    ),
    run AS (
      SELECT big_n,
             SUM(term) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS r
      FROM term
    )
    SELECT MAX(r) AS ece, COUNT(*) AS n_bins,
           MAX(big_n) AS n
    FROM run
    """,
)
def ml_expected_calibration_error_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ml eval / expected calibration error — the scalar the
    reliability diagram (ml-calibration-bins) summarizes to:
    Σ (n_b/N)·|pos_rate_b − avg_score_b| over the 10 deciles. Bin
    cores are the proven integer quantizations; the 10 nonnegative
    double terms reduce in a deterministic ORDER BY bin window (the
    registry's k≤17 rule) closed by MAX."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    g = ev.agg(F.max("value").alias("gmax"))
    s = ev.crossJoin(F.broadcast(g)).select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.least(
            F.floor((F.col("value") / F.col("gmax")) * 10),
            F.lit(9).cast("bigint"),
        ).alias("bin"),
        F.floor(
            (F.col("value") / F.col("gmax")) * F.lit(1e12)
        ).alias("si"),
    )
    b = s.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("np"),
        F.sum("si").alias("ssi"),
    )
    t = b.groupBy().agg(F.sum("n").cast("bigint").alias("big_n"))
    nd = F.col("n").cast("double")
    term = b.crossJoin(F.broadcast(t)).select(
        "bin",
        "big_n",
        (
            (nd / F.col("big_n").cast("double"))
            * F.abs(
                F.col("np").cast("double") / nd
                - F.col("ssi").cast("double") / (nd * F.lit(1e12))
            )
        ).alias("term"),
    )
    run = term.select(
        "big_n",
        F.sum("term")
        .over(
            W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        )
        .alias("r"),
    )
    return run.groupBy().agg(
        F.max("r").alias("ece"),
        F.count(F.lit(1)).alias("n_bins"),
        F.max("big_n").alias("n"),
    )
