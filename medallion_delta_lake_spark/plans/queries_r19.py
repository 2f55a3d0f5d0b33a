"""DRAFT round-19 query faces — NOT registered (cohorts r13..r18 are
queued ahead; registering early would mint registered-never-checked
ids). Same proof protocol as every cohort since r10:
tests/test_r19_drafts.py proves each face compare_query-green at two
SFs before registration is ever considered.

- sink-settxn-exactly-once — the SetTransaction exactly-once
  handshake driven E2E: three idempotent batches, a RETRY of batch 2
  skipped by the last_txn_version watermark, and a direct
  double-commit attempt REFUSED by the engine guard
  (DeltaConcurrentWriteError) — the final table must hold each batch
  exactly once, with the refusal count pinned in the rows;
- scan-csv-multiline-quoted — CSV round trip where fields carry
  embedded commas, quotes, and NEWLINES (``multiLine`` read): the
  parser face scan-csv-typed/malformed-audit don't cover;
- dq-freshness-lag — per-stream staleness (max event time vs the
  global watermark, integer seconds): the freshness gate every
  ingestion SLA dashboard runs;
- agg-median-of-means — the robust-statistics estimator (hash into
  16 buckets, exact per-bucket quantized means, lower-median element
  selection) that bounds adversarial-outlier influence where the
  plain mean breaks and the exact median costs a full sort;
- graph-assortativity — degree-assortativity (Pearson r of endpoint
  degrees over edges): do hubs link to hubs? Exact integer moments,
  one fixed IEEE close;
- join-allen-intervals — Allen-relation census between each user's
  consecutive 30-min activity intervals (precedes/meets/overlaps/
  starts/equals) — the temporal-algebra profile of a session stream;
- text-lang-confusion — the language-ID confusion matrix against the
  labeled corpus lang + per-language precision/recall counts: ties
  the text family's classifier to the ml-eval methodology;
- ml-topk-agreement — overlap@k / Jaccard@k between two rankings of
  users (by spend vs by activity): the rank-stability check run
  before swapping a ranking model;
- events-peak-concurrency — per-day peak concurrent 30-min sessions
  via the +1/−1 sweep (ends before starts at the same second), the
  capacity-planning number;
- stats-bowker-symmetry — Bowker's test of matrix symmetry over the
  period-A→B segment-migration matrix (are upgrades as common as
  downgrades?), per-cell-pair exact quantized contributions.
"""

from __future__ import annotations

import hashlib as _hashlib
import os as _os
import shutil as _shutil
import tempfile as _tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.hashing import h64, h64_sql
from medallion_delta_lake_spark.operators.agg import q_div
from medallion_delta_lake_spark.plans.registry import table

R19_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
R19_ORACLES: dict[str, str] = {}


def draft(name: str, oracle: str):
    def deco(fn):
        R19_QUERIES[name] = fn
        R19_ORACLES[name] = oracle
        return fn

    return deco


def _scratch(sf_dir: str, name: str) -> str:
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return _os.path.join(
        _tempfile.gettempdir(), f"mdls_r19_{tag}_{_os.getpid()}", name
    )


# ------------------------------------------------------------------
# sink-settxn-exactly-once


@draft(
    "sink-settxn-exactly-once",
    # batches m=1,2,3 each land exactly once; the batch-2 retry is
    # skipped by the watermark and the direct double-commit is
    # refused by the engine (n_refused pinned at 1, watermark at 3)
    oracle="""
    WITH sub AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE value IS NOT NULL AND event_id % 4 IN (1, 2, 3)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           CAST(3 AS BIGINT) AS last_txn,
           CAST(1 AS BIGINT) AS n_refused
    FROM sub GROUP BY event_type
    """,
)
def sink_settxn_exactly_once_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """sink / SetTransaction exactly-once handshake — the streaming
    writer's idempotence protocol driven end to end
    (sources/delta_log.py:write_delta txn= / last_txn_version): three
    batches append with rising (appId, version) watermarks; a RETRY
    of batch 2 consults the watermark and is skipped; a deliberate
    direct re-commit of batch 2 bypassing the check is REFUSED by the
    engine's in-commit guard (DeltaConcurrentWriteError — closing the
    check-then-write race). The final table must therefore hold every
    batch exactly once — any duplicate or lost batch breaks the
    row-hash — and the refusal count + final watermark are pinned
    into the output."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "settxn")
    _shutil.rmtree(p, ignore_errors=True)
    app = "mdls_loader"
    sub = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            (F.col("event_id") % 4).alias("m"),
        )
    )

    def batch(i: int) -> DataFrame:
        return sub.filter(F.col("m") == i).drop("m").coalesce(1)

    def deliver(i: int, txn_v: int) -> None:
        """The exactly-once protocol: check the watermark, skip
        already-recorded versions, else append with the txn action."""
        if dl.last_txn_version(p, app) >= txn_v:
            return
        mode = "append" if dl.is_delta_table(p) else "overwrite"
        dl.write_delta(spark, batch(i), p, mode=mode, txn=(app, txn_v))

    deliver(1, 1)
    deliver(2, 2)
    deliver(2, 2)  # retry — watermark says done, protocol skips
    n_refused = 0
    try:  # bypass the check: the ENGINE guard must refuse the commit
        dl.write_delta(
            spark, batch(2), p, mode="append", txn=(app, 2)
        )
    except dl.DeltaConcurrentWriteError:
        n_refused = 1
    deliver(3, 3)
    out = dl.read_delta(spark, p).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents_sum"),
    )
    return out.select(
        "event_type",
        "n",
        "cents_sum",
        F.lit(dl.last_txn_version(p, app)).cast("bigint").alias(
            "last_txn"
        ),
        F.lit(n_refused).cast("bigint").alias("n_refused"),
    )


# ------------------------------------------------------------------
# scan-csv-multiline-quoted


@draft(
    "scan-csv-multiline-quoted",
    # payload = event_type || ', "x"' || newline || 'y' — commas,
    # quotes, and a real newline inside ONE quoted field; the
    # round-trip must preserve it byte-for-byte
    oracle="""
    WITH sub AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             event_type || ', "x"' || chr(10) || 'y' AS payload
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(length(payload)) AS BIGINT) AS payload_chars,
           CAST(SUM(cents) AS BIGINT) AS cents_sum
    FROM sub GROUP BY event_type
    """,
)
def scan_csv_multiline_quoted_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """scan / CSV with quoted multiline fields — every row's payload
    embeds a comma, escaped quotes, AND a literal newline; the writer
    must quote/escape, and the ``multiLine`` reader must reassemble
    records across physical lines (the default line-splitting reader
    would shear every row in half). The aggregate proves
    byte-fidelity: payload character counts and cents survive the
    round trip exactly. This is the landing-zone reality
    scan-csv-typed's clean rows skip — free-text columns carry
    newlines. multiLine costs file-at-a-time parallelism (no
    line-split chunking) — the documented trade."""
    p = _scratch(sf_dir, "csv_ml")
    _shutil.rmtree(p, ignore_errors=True)
    sub = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            F.concat(
                F.col("event_type"),
                F.lit(', "x"\ny'),
            ).alias("payload"),
        )
    )
    (
        sub.coalesce(4)
        .write.mode("overwrite")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(p)
    )
    schema = (
        "event_id bigint, event_type string, cents bigint,"
        " payload string"
    )
    back = (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(p)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.length("payload")).cast("bigint").alias(
            "payload_chars"
        ),
        F.sum("cents").cast("bigint").alias("cents_sum"),
    )


# ------------------------------------------------------------------
# dq-freshness-lag


@draft(
    "dq-freshness-lag",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) AS max_s
      FROM events GROUP BY event_type
    ),
    g AS (SELECT MAX(max_s) AS gmax FROM m)
    SELECT m.event_type, m.n,
           CAST(g.gmax - m.max_s AS BIGINT) AS lag_s
    FROM m, g
    """,
)
def dq_freshness_lag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dq / per-stream freshness lag — each event type's newest
    record vs the global watermark, in integer seconds: the staleness
    gate an ingestion SLA dashboard alerts on (a stream whose lag
    grows is a stuck upstream — the failure mode row counts don't
    show until much later). One grouped max + a broadcast 1-row
    global; exact epoch-second arithmetic."""
    ev = table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max(F.unix_timestamp("ts")).cast("bigint").alias("max_s"),
    )
    g = m.agg(F.max("max_s").alias("gmax"))
    return m.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n",
        (F.col("gmax") - F.col("max_s")).cast("bigint").alias("lag_s"),
    )


# ------------------------------------------------------------------
# agg-median-of-means

_MOM_BUCKETS = 16


@draft(
    "agg-median-of-means",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             {h64_sql("CAST(event_id AS VARCHAR)")} % {_MOM_BUCKETS}
               AS bucket,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT event_type, bucket,
             CAST((CAST(SUM(cents) AS HUGEINT) * 1000000) // COUNT(*)
                  AS BIGINT) AS mean_q6
      FROM b GROUP BY event_type, bucket
    ),
    f AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             list_sort(list(mean_q6)) AS means
      FROM m GROUP BY event_type
    )
    SELECT event_type, n_buckets,
           CAST(means[CAST((n_buckets + 1) // 2 AS INT)] AS BIGINT)
             AS mom_q6
    FROM f
    """,
)
def agg_median_of_means_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """agg / median-of-means — the robust mean estimator: rows hash
    into 16 buckets (portable h64 — reproducible, adversary-oblivious),
    each bucket's mean closes as one exact quantized integer, and the
    estimate is the LOWER MEDIAN element of the sorted bucket means —
    outliers can poison at most their own bucket, so the estimator
    tolerates up to ~half-a-bucket of corruption where the plain mean
    is unbounded, at one map-side-combined pass (the exact median of
    all rows costs a per-group sort). Element selection keeps it
    engine-exact with zero float arithmetic."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    b = ev.select(
        "event_type",
        F.pmod(
            h64(F.col("event_id").cast("string")), F.lit(_MOM_BUCKETS)
        ).alias("bucket"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    m = b.groupBy("event_type", "bucket").agg(
        q_div(
            F.sum("cents").cast("decimal(38,0)"),
            F.count(F.lit(1)).cast("decimal(38,0)"),
            6,
        ).alias("mean_q6")
    )
    f = m.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sort_array(F.collect_list("mean_q6")).alias("means"),
    )
    return f.select(
        "event_type",
        "n_buckets",
        F.element_at(
            F.col("means"),
            ((F.col("n_buckets") + 1) / 2).cast("int"),
        ).cast("bigint").alias("mom_q6"),
    )


# ------------------------------------------------------------------
# graph-assortativity


@draft(
    "graph-assortativity",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT l_partkey * 2 AS s, l_suppkey * 2 + 1 AS d
      FROM lineitem
    ),
    e AS (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0),
    deg AS (SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS k
            FROM e GROUP BY s),
    x AS (
      SELECT ds.k AS xk, dd.k AS yk
      FROM e JOIN deg ds ON e.s = ds.id JOIN deg dd ON e.d = dd.id
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(xk) AS BIGINT) AS sx,
             CAST(SUM(yk) AS BIGINT) AS sy,
             CAST(SUM(xk * yk) AS BIGINT) AS sxy,
             CAST(SUM(xk * xk) AS BIGINT) AS sxx,
             CAST(SUM(yk * yk) AS BIGINT) AS syy
      FROM x
    )
    SELECT m AS n_directed_edges,
      CASE WHEN (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
            AND (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0 THEN
        (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      END AS assortativity
    FROM t
    """,
)
def graph_assortativity_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """graph / degree assortativity — Pearson correlation of endpoint
    degrees over the symmetrized part↔supplier edge list: negative
    (hubs attach to leaves — the disassortative shape supply networks
    and the web show) vs positive (hub-to-hub, social-graph-like);
    the one-number structure summary that decides whether hub-capping
    heuristics (the dedup/ANN families' degree caps) will bite. Exact
    BIGINT moments over the edge frame (bigint→double casts are
    correctly rounded in both engines), one fixed IEEE close. Plan:
    one degree aggregate + two broadcast-able joins back to edges +
    one 1-row fold."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_partkey") * 2).alias("s"),
            (F.col("l_suppkey") * 2 + 1).alias("d"),
        )
        .distinct()
    )
    e = li.unionByName(
        li.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    deg = e.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    x = (
        e.join(deg.withColumnRenamed("id", "s"), "s")
        .withColumnRenamed("k", "xk")
        .join(
            deg.withColumnRenamed("id", "d").withColumnRenamed(
                "k", "yk"
            ),
            "d",
        )
        .select("xk", "yk")
    )
    t = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("xk").cast("bigint").alias("sx"),
        F.sum("yk").cast("bigint").alias("sy"),
        F.sum(F.col("xk") * F.col("yk")).cast("bigint").alias("sxy"),
        F.sum(F.col("xk") * F.col("xk")).cast("bigint").alias("sxx"),
        F.sum(F.col("yk") * F.col("yk")).cast("bigint").alias("syy"),
    )
    md = F.col("m").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    vx = md * F.col("sxx").cast("double") - sxd * sxd
    vy = md * F.col("syy").cast("double") - syd * syd
    num = md * F.col("sxy").cast("double") - sxd * syd
    return t.select(
        F.col("m").alias("n_directed_edges"),
        F.when(
            (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
        ).alias("assortativity"),
    )


# ------------------------------------------------------------------
# join-allen-intervals

_ALLEN_LEN = 1800


@draft(
    "join-allen-intervals",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_s
      FROM events WHERE user_id IS NOT NULL
    ),
    p AS (
      SELECT s - prev_s AS gap FROM e WHERE prev_s IS NOT NULL
    ),
    r AS (
      SELECT CASE
               WHEN gap = 0 THEN 'equals'
               WHEN gap > {_ALLEN_LEN} THEN 'precedes'
               WHEN gap = {_ALLEN_LEN} THEN 'meets'
               ELSE 'overlaps'
             END AS relation
      FROM p
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM r GROUP BY relation
    """,
)
def join_allen_intervals_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """join / Allen-relation census — classify every user's
    consecutive pair of 30-minute activity intervals by Allen's
    interval algebra (equals / overlaps / meets / precedes — the full
    13 collapse to these for equal-length ordered intervals): the
    temporal profile that says whether a stream is one continuous
    session (overlaps), back-to-back bursts (meets), or sparse visits
    (precedes) — what a single gap-threshold sessionizer flattens.
    Integer epoch-second arithmetic over the user-partitioned lag
    window; one grouped count closes it."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = F.unix_timestamp("ts").cast("bigint")
    p = (
        ev.select(
            s.alias("s"), F.lag(s).over(w).alias("prev_s")
        )
        .filter(F.col("prev_s").isNotNull())
        .select((F.col("s") - F.col("prev_s")).alias("gap"))
    )
    rel = (
        F.when(F.col("gap") == 0, "equals")
        .when(F.col("gap") > _ALLEN_LEN, "precedes")
        .when(F.col("gap") == _ALLEN_LEN, "meets")
        .otherwise("overlaps")
    )
    return p.select(rel.alias("relation")).groupBy("relation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


# ------------------------------------------------------------------
# text-lang-confusion


def _lang_conf_oracle() -> str:
    from medallion_delta_lake_spark.operators import (
        text_analysis as ta,
    )
    from medallion_delta_lake_spark.plans.queries_text import (
        TOKS_SQL,
        _sw_hits_sql,
    )

    langs = list(ta.STOPWORDS)
    score_cols = ",\n             ".join(
        f"{_sw_hits_sql('toks', ta.STOPWORDS[lang])} AS score_{lang}"
        for lang in langs
    )
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"score_{lang} > 0"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"score_{lang} > score_{other}")
            elif j != i:
                conds.append(f"score_{lang} >= score_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""
    WITH d AS (
      SELECT doc_id, lang, {TOKS_SQL} AS toks FROM documents
    ),
    s AS (SELECT doc_id, lang,
             {score_cols}
          FROM d),
    pred AS (
      SELECT lang AS actual, {case_sql} AS detected FROM s
    ),
    conf AS (
      SELECT actual, detected, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY actual, detected
    ),
    tot AS (
      SELECT actual, CAST(SUM(n) AS BIGINT) AS t FROM conf
      GROUP BY actual
    )
    SELECT conf.actual, conf.detected, conf.n,
           CAST((CAST(conf.n AS HUGEINT) * 1000000) // tot.t
                AS BIGINT) AS share_q6
    FROM conf JOIN tot ON conf.actual = tot.actual
    """


@draft("text-lang-confusion", oracle=_lang_conf_oracle())
def text_lang_confusion_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """text / language-ID confusion matrix — the stopword-profile
    classifier (operators/text_analysis.py:language_id, the
    text-lang-id face) evaluated against the corpus's LABELED lang
    column: per (actual, detected) counts and within-actual recall
    shares — the ml-eval treatment the text family's classifier never
    had (accuracy by language exposes exactly which low-resource
    languages fall to 'und'). One classify pass + one ≤36-cell
    aggregate."""
    from medallion_delta_lake_spark.operators.text_analysis import (
        language_id,
    )

    docs = table(spark, sf_dir, "documents")
    pred = language_id(docs, id_cols=("doc_id", "lang")).select(
        F.col("lang").alias("actual"),
        F.col("detected_lang").alias("detected"),
    )
    conf = pred.groupBy("actual", "detected").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = conf.groupBy("actual").agg(
        F.sum("n").cast("bigint").alias("t")
    )
    return conf.join(F.broadcast(tot), "actual").select(
        "actual",
        "detected",
        "n",
        q_div(
            F.col("n").cast("decimal(38,0)"),
            F.col("t").cast("decimal(38,0)"),
            6,
        ).alias("share_q6"),
    )


# ------------------------------------------------------------------
# ml-topk-agreement

_TOPK_MAX = 50


@draft(
    "ml-topk-agreement",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id
    ),
    ra AS (
      SELECT user_id, ROW_NUMBER() OVER (
        ORDER BY cents DESC, user_id) AS r
      FROM u QUALIFY r <= {_TOPK_MAX}
    ),
    rb AS (
      SELECT user_id, ROW_NUMBER() OVER (
        ORDER BY n_events DESC, user_id) AS r
      FROM u QUALIFY r <= {_TOPK_MAX}
    ),
    j AS (
      SELECT COALESCE(ra.user_id, rb.user_id) AS user_id,
             ra.r AS r_a, rb.r AS r_b
      FROM ra FULL OUTER JOIN rb ON ra.user_id = rb.user_id
    ),
    ks AS (SELECT unnest([10, 25, 50]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
      CAST(SUM(CASE WHEN j.r_a <= ks.k AND j.r_b <= ks.k
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
      CAST((CAST(SUM(CASE WHEN j.r_a <= ks.k AND j.r_b <= ks.k
                          THEN 1 ELSE 0 END) AS HUGEINT) * 1000000)
           // (2 * ks.k - SUM(CASE WHEN j.r_a <= ks.k
                                    AND j.r_b <= ks.k
                                   THEN 1 ELSE 0 END))
        AS BIGINT) AS jaccard_q6
    FROM ks, j GROUP BY ks.k
    """,
)
def ml_topk_agreement_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml eval / top-k rank agreement — overlap@k and Jaccard@k
    between two user rankings (by purchase spend vs by activity):
    the stability check run before swapping a ranking model or
    promotion criterion (low agreement at small k means the change
    reshuffles exactly the users a campaign would target). Both
    top-50 frames come from TakeOrderedAndProject (orderBy().limit —
    never a global row_number over the user frame); the ≤50-row
    post-limit rank windows are allowlisted, and the k-sweep is a
    constant 3-row explode. Counts exact; Jaccard is one quantized
    division."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100).cast("bigint"),
            ).otherwise(0)
        ).cast("bigint").alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    top_a = u.orderBy(
        F.col("cents").desc(), F.col("user_id")
    ).limit(_TOPK_MAX)
    top_b = u.orderBy(
        F.col("n_events").desc(), F.col("user_id")
    ).limit(_TOPK_MAX)
    # ≤50-row post-limit frames — reviewed global-window sites
    wa = Window.orderBy(F.col("cents").desc(), F.col("user_id"))
    wb = Window.orderBy(F.col("n_events").desc(), F.col("user_id"))
    ra = top_a.select(
        "user_id", F.row_number().over(wa).alias("r_a")
    )
    rb = top_b.select(
        "user_id", F.row_number().over(wb).alias("r_b")
    )
    j = ra.join(rb, "user_id", "full_outer")
    ks = F.explode(F.array(F.lit(10), F.lit(25), F.lit(50))).alias(
        "k"
    )
    kj = j.select("r_a", "r_b").crossJoin(
        F.broadcast(
            table(spark, sf_dir, "region").limit(1).select(
                ks
            )
        )
    )
    agg = kj.groupBy("k").agg(
        F.sum(
            F.when(
                (F.col("r_a") <= F.col("k"))
                & (F.col("r_b") <= F.col("k")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_common")
    )
    return agg.select(
        F.col("k").cast("bigint").alias("k"),
        "n_common",
        q_div(
            F.col("n_common").cast("decimal(38,0)"),
            (2 * F.col("k") - F.col("n_common")).cast("decimal(38,0)"),
            6,
        ).alias("jaccard_q6"),
    )


# ------------------------------------------------------------------
# events-peak-concurrency

_SESSION_S = 1800


@draft(
    "events-peak-concurrency",
    oracle=f"""
    WITH e AS (
      SELECT event_id, CAST(ts AS DATE) AS d,
             CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events
    ),
    pts AS (
      SELECT event_id, d, s AS t, 1 AS delta FROM e
      UNION ALL
      SELECT event_id, d, s + {_SESSION_S} AS t, -1 AS delta FROM e
    ),
    run AS (
      SELECT d,
             SUM(delta) OVER (PARTITION BY d
               ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS conc
      FROM pts
    )
    SELECT CAST(d - DATE '1970-01-01' AS BIGINT) AS day_idx,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions
    FROM run GROUP BY d
    """,
)
def events_peak_concurrency_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """events / per-day peak concurrency — the maximum number of
    simultaneously-open 30-minute sessions, via the classic +1/−1
    boundary sweep (an end sorts BEFORE a start at the same second —
    delta ascending — so back-to-back sessions don't double-count):
    the capacity-planning number a connection pool or rate limiter is
    sized against. The running sum partitions by calendar day
    (sessions attributed to their start day — documented clip), so
    the sweep is day-parallel however long the history. Exact integer
    arithmetic throughout."""
    ev = table(spark, sf_dir, "events")
    s = F.unix_timestamp("ts").cast("bigint")
    e = ev.select(
        "event_id",
        F.col("ts").cast("date").alias("d"),
        s.alias("s"),
    )
    pts = e.select(
        "event_id", "d", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        e.select(
            "event_id",
            "d",
            (F.col("s") + _SESSION_S).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("d")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("d", F.sum("delta").over(w).alias("conc"))
    return run.groupBy("d").agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions"),
    ).select(
        F.datediff(F.col("d"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("day_idx"),
        "peak_concurrency",
        "n_sessions",
    )


# ------------------------------------------------------------------
# stats-bowker-symmetry

_BOWKER_SEG_SQL = (
    "CASE WHEN s < 10000 THEN 1 WHEN s < 50000 THEN 2"
    " WHEN s < 200000 THEN 3 WHEN s < 1000000 THEN 4 ELSE 5 END"
)


@draft(
    "stats-bowker-symmetry",
    oracle=f"""
    WITH sub AS (
      SELECT user_id,
             CASE WHEN EXTRACT(DAY FROM ts) <= 15 THEN 'a' ELSE 'b'
             END AS period,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    m AS (
      SELECT user_id, period, CAST(SUM(cents) AS BIGINT) AS s
      FROM sub GROUP BY user_id, period
    ),
    seg AS (SELECT user_id, period, {_BOWKER_SEG_SQL} AS seg FROM m),
    a AS (SELECT user_id, seg FROM seg WHERE period = 'a'),
    b AS (SELECT user_id, seg FROM seg WHERE period = 'b'),
    mig AS (
      SELECT COALESCE(a.seg, 0) AS i, COALESCE(b.seg, 0) AS j,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT lo.i AS seg_lo, lo.j AS seg_hi,
             lo.n AS n_up, COALESCE(hi.n, 0) AS n_down
      FROM mig lo LEFT JOIN mig hi
        ON hi.i = lo.j AND hi.j = lo.i
      WHERE lo.i < lo.j
    )
    SELECT seg_lo, seg_hi, n_up, n_down,
           CAST((CAST((n_up - n_down) * (n_up - n_down) AS HUGEINT)
                 * 1000000) // (n_up + n_down) AS BIGINT)
             AS contrib_q6
    FROM pairs WHERE n_up + n_down > 0
    """,
)
def stats_bowker_symmetry_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """stats / Bowker's symmetry test over the monetary
    segment-migration matrix (the inferential companion of
    events-segment-migration, r18): per unordered segment pair,
    (n_up − n_down)²/(n_up + n_down) — large contributions mean the
    i→j flow is NOT mirrored by j→i (net upgrade or churn drift, not
    random shuffle); the statistic is the sum over pairs, χ² with
    one df per cell pair under symmetry. Every contribution is an
    exact quantized integer from the ≤36-cell matrix; the row-scale
    work is the same user-period aggregate the migration face runs."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    m = ev.groupBy(
        "user_id",
        F.when(F.dayofmonth("ts") <= 15, "a").otherwise("b").alias(
            "period"
        ),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("s")
    )
    seg = m.select(
        "user_id", "period", F.expr(_BOWKER_SEG_SQL).alias("seg")
    )
    a = seg.filter(F.col("period") == "a").select(
        "user_id", F.col("seg").alias("seg_a_raw")
    )
    b = seg.filter(F.col("period") == "b").select(
        "user_id", F.col("seg").alias("seg_b_raw")
    )
    mig = (
        a.join(b, "user_id", "full_outer")
        .groupBy(
            F.coalesce("seg_a_raw", F.lit(0)).alias("i"),
            F.coalesce("seg_b_raw", F.lit(0)).alias("j"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    lo = mig.filter(F.col("i") < F.col("j")).select(
        F.col("i").alias("seg_lo"),
        F.col("j").alias("seg_hi"),
        F.col("n").alias("n_up"),
    )
    hi = mig.select(
        F.col("j").alias("seg_lo"),
        F.col("i").alias("seg_hi"),
        F.col("n").alias("n_down"),
    )
    pairs = lo.join(hi, ["seg_lo", "seg_hi"], "left").select(
        "seg_lo",
        "seg_hi",
        "n_up",
        F.coalesce("n_down", F.lit(0)).cast("bigint").alias("n_down"),
    )
    diff = F.col("n_up") - F.col("n_down")
    return pairs.filter(
        F.col("n_up") + F.col("n_down") > 0
    ).select(
        "seg_lo",
        "seg_hi",
        "n_up",
        "n_down",
        q_div(
            (diff * diff).cast("decimal(38,0)"),
            (F.col("n_up") + F.col("n_down")).cast("decimal(38,0)"),
            6,
        ).alias("contrib_q6"),
    )
