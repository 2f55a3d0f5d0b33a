"""Text-analysis + text-dedup query surface over the ``documents``
table (SURVEY.md §2.11 extension ops), each with a DuckDB oracle.

Oracle-parity strategy (see functions/hashing.py): every score is
integer arithmetic or int/int double division, and every hash is the
portable md5-prefix h64 — so the value-hash comparison is exact.
The SQL twins are *generated from the same constants* (stopword lists,
regex literals, hash params) as the Spark plans to prevent drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.hashing import (
    B_ROLL,
    P_HASH,
    P_ROLL,
    h64_sql,
    minhash_params,
    rolling_fingerprint_sql,
)
from medallion_delta_lake_spark.operators import dedup
from medallion_delta_lake_spark.operators import text_analysis as ta
from medallion_delta_lake_spark.plans.registry import query, table

# ---- shared SQL fragments (DuckDB dialect twins of functions/texts.py)

NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
TOKS_SQL = f"string_split({NORM_SQL}, ' ')"


def _sw_hits_sql(toks_expr: str, words: list[str]) -> str:
    wl = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({toks_expr}, t -> list_contains({wl}, t)))"


@query(
    "text-token-stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {NORM_SQL} AS norm, {TOKS_SQL} AS toks FROM documents
    )
    SELECT doc_id,
           length(norm) AS n_chars,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           len(regexp_extract_all(norm, '{ta.REGEX_TOKEN_PATTERN}'))
             AS n_regex_tokens,
           CAST(length(norm) - len(toks) + 1 AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS mean_token_len
    FROM d
    """,
)
def text_token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text-analysis / token counting — whitespace + regex (BPE-ish)
    token counts per document. Pure per-row codegen, no shuffle."""
    return ta.token_stats(table(spark, sf_dir, "documents"))


def _quality_oracle() -> str:
    sw = _sw_hits_sql("toks", ta.STOPWORDS["en"])
    return f"""
    WITH d AS (
      SELECT doc_id, {NORM_SQL} AS norm, {TOKS_SQL} AS toks FROM documents
    ), m AS (
      SELECT doc_id,
             length(norm) AS n_chars,
             len(toks) AS n_tokens,
             length(regexp_replace(norm, '[^a-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(norm, '[^0-9]', '', 'g')) AS n_digit,
             length(regexp_replace(norm, '[^ ]', '', 'g')) AS n_space,
             {sw} AS sw
      FROM d
    )
    SELECT doc_id, n_chars, n_tokens,
           CAST(sw AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
           CAST(n_chars - n_alpha - n_digit - n_space AS DOUBLE)
             / CAST(n_chars AS DOUBLE) AS punct_ratio,
           CAST(n_chars - n_tokens + 1 AS DOUBLE)
             / CAST(n_tokens AS DOUBLE) AS mean_token_len,
           CAST(
             (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 25 ELSE 0 END)
           + (CASE WHEN CAST(sw AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.05
                   THEN 25 ELSE 0 END)
           + (CASE WHEN CAST(n_chars - n_alpha - n_digit - n_space AS DOUBLE)
                        / CAST(n_chars AS DOUBLE) <= 0.2
                   THEN 25 ELSE 0 END)
           + (CASE WHEN CAST(n_chars - n_tokens + 1 AS DOUBLE)
                        / CAST(n_tokens AS DOUBLE) BETWEEN 3.0 AND 10.0
                   THEN 25 ELSE 0 END) AS INT) AS quality_score
    FROM m
    """


@query("text-quality-score", oracle=_quality_oracle())
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text-analysis / quality scoring — char-class ratios + stopword
    density → 0–100 rubric, the corpus-filtering pass of an LLM data
    pipeline. Deterministic integer/ratio arithmetic only."""
    return ta.quality_score(table(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    langs = list(ta.STOPWORDS)
    score_cols = ",\n             ".join(
        f"{_sw_hits_sql('toks', ta.STOPWORDS[lang])} AS score_{lang}"
        for lang in langs
    )
    # same priority-order argmax as text_analysis.language_id: lang i
    # must strictly beat earlier langs, tie-or-beat later langs
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
    WITH d AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    s AS (SELECT doc_id,
             {score_cols}
          FROM d)
    SELECT doc_id, {', '.join(f'score_{lang}' for lang in langs)},
           {case_sql} AS detected_lang
    FROM s
    """


@query("text-lang-id", oracle=_langid_oracle())
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text-analysis / language ID — stopword-profile scoring with
    deterministic argmax. (The synthetic corpus is English-shaped in
    every row, so 'en'/'und' dominate; the operator contract — scores +
    priority argmax — is what the oracle checks.)"""
    return ta.language_id(table(spark, sf_dir, "documents"))


@query(
    "text-fingerprint",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {NORM_SQL} AS norm, {TOKS_SQL} AS toks FROM documents
    )
    SELECT doc_id,
           {rolling_fingerprint_sql('toks')} AS fingerprint,
           {h64_sql('norm')} AS content_hash
    FROM d
    """,
)
def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text-analysis / fingerprinting — order-sensitive rolling hash +
    content hash per document (the 8-byte dedup key that replaces
    full-text shuffle at 100 TB)."""
    return ta.fingerprint(table(spark, sf_dir, "documents"))


# --------------------------------------------------------------- dedup family
#
# The sf documents are all-distinct, so the dedup queries run on a
# corpus *with planted duplicates*: every 7th doc repeated verbatim
# (exact dup) and every 11th doc with a token tail appended (near dup).
# The oracle CTE plants the same rows, so recall/precision of each
# strategy is actually exercised.

_NEAR_TAIL = " shared tail tokens appended for near dup"

CORPUS_SQL = f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 200000, text || '{_NEAR_TAIL}'
      FROM documents WHERE doc_id % 11 = 0
"""

# DuckDB twins of functions/texts.py shingles(n=3) + hashing over them
SHINGLES_SQL = (
    "list_transform(range(0, greatest(len(toks)-3, 0) + 1),"
    " i -> array_to_string(toks[i+1:i+3], ' '))"
)
SH_SQL = f"list_distinct(list_transform({SHINGLES_SQL}, sg -> {h64_sql('sg')}))"

_SETS_CTE = f"""
    corpus AS ({CORPUS_SQL}),
    toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM corpus),
    sets AS (SELECT doc_id, {SH_SQL} AS sh FROM toksed)
"""


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_NEAR_TAIL)).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


@query(
    "dedup-exact-hash",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    h AS (SELECT doc_id, {h64_sql(NORM_SQL)} AS content_hash FROM corpus)
    SELECT content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM h GROUP BY content_hash
    """,
)
def dedup_exact_hash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / exact — content-hash groupBy keeping the minimum id.
    Shuffles (hash, id) pairs only; at 100 TB the map side pre-combines
    so the shuffle is O(distinct docs)."""
    return dedup.exact_dedup_groups(_dup_corpus(spark, sf_dir))


def _jaccard_sql(threshold: float) -> str:
    # models dedup.DEFAULT_MAX_DF: candidate generation drops shingles
    # above the boilerplate document-frequency cap; the exact score
    # still uses the full shingle sets (same split as the Spark op)
    inter = "len(list_intersect(sa.sh, sb.sh))"
    return f"""
    postings AS (SELECT doc_id, unnest(sh) AS shingle_hash FROM sets),
    kept AS (
      SELECT shingle_hash FROM postings
      GROUP BY shingle_hash HAVING COUNT(*) <= {dedup.DEFAULT_MAX_DF}
    ),
    capped AS (
      SELECT p.doc_id, p.shingle_hash
      FROM postings p JOIN kept k USING (shingle_hash)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM capped a JOIN capped b
        ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT p.id_a, p.id_b,
             CAST({inter} AS DOUBLE)
               / CAST(len(sa.sh) + len(sb.sh) - {inter} AS DOUBLE) AS jaccard
      FROM pairs p
      JOIN sets sa ON sa.doc_id = p.id_a
      JOIN sets sb ON sb.doc_id = p.id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= {threshold}
    """


@query(
    "dedup-ngram-jaccard",
    oracle=f"WITH {_SETS_CTE}, {_jaccard_sql(0.6)}",
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / n-gram Jaccard — inverted-index self-join on 3-gram
    shingle hashes; exact Jaccard ≥ 0.6. Pair generation only touches
    docs that share a shingle (16-byte postings, never raw text)."""
    return dedup.ngram_jaccard_pairs(
        _dup_corpus(spark, sf_dir),
        n=3,
        threshold=0.6,
        fan_out=spark.sparkContext.defaultParallelism,
    )


def _minhash_expr_sql(a: int, b: int) -> str:
    return (
        f"CAST(list_min(list_transform(sh,"
        f" x -> ({a} * (x % {P_HASH}) + {b}) % {P_HASH})) AS BIGINT)"
    )


_NUM_PERM = 16
_BANDS = 4
_ROWS_PER_BAND = _NUM_PERM // _BANDS


def _minhash_sig_list_sql() -> str:
    exprs = ", ".join(_minhash_expr_sql(a, b) for a, b in minhash_params(_NUM_PERM))
    return f"[{exprs}]"


@query(
    "dedup-minhash-sig",
    oracle=f"""
    WITH {_SETS_CTE},
    sigs AS (SELECT doc_id, {_minhash_sig_list_sql()} AS sig FROM sets)
    SELECT doc_id, CAST(i - 1 AS INT) AS perm, sig[i] AS minhash
    FROM sigs, unnest(range(1, {_NUM_PERM} + 1)) AS r(i)
    """,
)
def dedup_minhash_sig_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / MinHash signatures — 16 universal-hash permutations over
    the shingle-hash set, long form (doc, perm, minhash)."""
    return dedup.minhash_signatures(
        _dup_corpus(spark, sf_dir),
        n=3,
        num_perm=_NUM_PERM,
        fan_out=spark.sparkContext.defaultParallelism,
    )


def _band_key_sql(slice_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {slice_expr}),"
        f" (s, x) -> (s * {B_ROLL} + (x % {P_ROLL})) % {P_ROLL})"
    )


# full candidate-generation + exact-verify pipeline as one CTE chain,
# shared by the pair query and the connected-components oracle below
_LSH_SCORED_CTE = f"""{_SETS_CTE},
    sigs AS (SELECT doc_id, {_minhash_sig_list_sql()} AS sig FROM sets),
    bkeys AS (
      SELECT doc_id,
             [{', '.join(_band_key_sql(f'sig[{b * _ROWS_PER_BAND + 1}:{(b + 1) * _ROWS_PER_BAND}]') for b in range(_BANDS))}]
               AS bks
      FROM sigs
    ),
    banded AS (
      SELECT doc_id, CAST(i - 1 AS INT) AS band, bks[i] AS band_key
      FROM bkeys, unnest(range(1, {_BANDS} + 1)) AS r(i)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT p.id_a, p.id_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / CAST(len(sa.sh) + len(sb.sh)
                      - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS jaccard
      FROM pairs p
      JOIN sets sa ON sa.doc_id = p.id_a
      JOIN sets sb ON sb.doc_id = p.id_b
    )"""


@query(
    "dedup-minhash-lsh",
    oracle=f"""
    WITH {_LSH_SCORED_CTE}
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
    """,
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / MinHash + LSH — 4 bands × 4 rows banding generates
    candidates sub-quadratically; exact Jaccard verification keeps
    precision at 1.0. The 100 TB scale path for near-dup dedup."""
    return dedup.minhash_lsh_pairs(
        _dup_corpus(spark, sf_dir),
        n=3,
        num_perm=_NUM_PERM,
        bands=_BANDS,
        threshold=0.5,
        fan_out=spark.sparkContext.defaultParallelism,
    )


_SIMHASH_BITS = 32


def _simhash_sql() -> str:
    votes = []
    for j in range(_SIMHASH_BITS):
        vote = (
            f"coalesce(list_sum(list_transform(th,"
            f" x -> CASE WHEN ((x >> {j}) & 1) = 1 THEN 1 ELSE -1 END)), 0)"
        )
        votes.append(
            f"CASE WHEN {vote} >= 0 THEN CAST({2**j} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END"
        )
    return " + ".join(votes)


_TH_CTE = f"""
    corpus AS ({CORPUS_SQL}),
    toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM corpus),
    th_t AS (SELECT doc_id,
                    list_transform(toks, t -> {h64_sql('t')}) AS th
             FROM toksed)
"""


@query(
    "dedup-simhash",
    oracle=f"""
    WITH {_TH_CTE}
    SELECT doc_id, CAST({_simhash_sql()} AS BIGINT) AS simhash FROM th_t
    """,
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / SimHash — 32-bit majority-vote signature over token
    hashes (frequency-weighted); per-row expression, no shuffle."""
    return dedup.simhash(
        _dup_corpus(spark, sf_dir),
        bits=_SIMHASH_BITS,
        fan_out=spark.sparkContext.defaultParallelism,
    )


@query(
    "dedup-simhash-pairs",
    oracle=f"""
    WITH {_TH_CTE},
    sh_t AS (SELECT doc_id, CAST({_simhash_sql()} AS BIGINT) AS simhash
             FROM th_t),
    banded AS (
      SELECT doc_id, simhash, CAST(i - 1 AS INT) AS band,
             (simhash >> ((i - 1) * 8)) & 255 AS band_key
      FROM sh_t, unnest(range(1, 5)) AS r(i)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / SimHash pairs — banded hamming-distance join (pigeonhole
    recall: distance ≤ 3 ⇒ one of 4 bytes identical)."""
    return dedup.simhash_pairs(
        _dup_corpus(spark, sf_dir),
        bits=_SIMHASH_BITS,
        bands=4,
        max_hamming=3,
        fan_out=spark.sparkContext.defaultParallelism,
    )


@query(
    "dedup-cluster-assign",
    # Connected components IS SQL-expressible: transitive closure as a
    # recursive CTE (UNION dedups rows, so the recursion terminates),
    # then cluster = MIN over the reachable set. Quadratic in cluster
    # size — fine for an oracle, the distributed path is the operator.
    oracle=f"""
    WITH RECURSIVE {_LSH_SCORED_CTE},
    good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM good
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM good
    ),
    walk(doc_id, node) AS (
      SELECT doc_id, doc_id AS node FROM corpus
      UNION
      SELECT w.doc_id, e.dst AS node
      FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT doc_id, MIN(node) AS cluster FROM walk GROUP BY doc_id
    """,
)
def dedup_cluster_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / cluster assignment — connected components over the
    MinHash-LSH near-dup pairs: every doc mapped to its duplicate
    group's minimum id (the surviving representative). Iterative
    min-label propagation; verified against a union-find reference in
    tests/test_dedup_clusters.py and against the recursive-CTE
    transitive-closure oracle."""
    corpus = _dup_corpus(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        corpus,
        n=3,
        num_perm=_NUM_PERM,
        bands=_BANDS,
        threshold=0.5,
        fan_out=spark.sparkContext.defaultParallelism,
    )
    return dedup.neardup_clusters(corpus.select("doc_id"), pairs)


@query(
    "text-scrub-pii",
    # the natural corpus has no PII, so the query plants a
    # deterministic email + long number per doc; both engines build
    # and scrub the same string (patterns restricted to Java/RE2-
    # compatible syntax)
    oracle=r"""
    WITH planted AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com ref 99' || doc_id || '0001 end' AS t
      FROM documents
    ),
    e AS (
      SELECT doc_id,
             regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS after_email,
             t
      FROM planted
    )
    SELECT doc_id,
           regexp_replace(after_email, '[0-9]{6,}', '<NUM>', 'g')
             AS scrubbed,
           CAST(len(string_split_regex(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1
             AS INT) AS n_emails,
           CAST(len(string_split_regex(after_email, '[0-9]{6,}')) - 1
             AS INT) AS n_numbers,
           length(regexp_replace(after_email, '[0-9]{6,}', '<NUM>', 'g'))
             AS scrubbed_len
    FROM e
    """,
)
def text_scrub_pii_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / PII scrub — email + long-number redaction with per-row
    audit counts (the pre-training privacy pass). Pure codegen
    regexp_replace, zero shuffle."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ref 99"),
            F.col("doc_id").cast("string"),
            F.lit("0001 end"),
        ).alias("text"),
    )
    return ta.scrub_pii(d)


@query(
    "text-tfidf-stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ),
    toks AS (SELECT doc_id, unnest(toks) AS token FROM d),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf
           FROM toks GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT t.doc_id, t.token, t.tf, f.df, n.n_docs
    FROM tf t JOIN dfreq f ON f.token = t.token, n
    """,
)
def text_tfidf_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / TF-IDF term statistics — exact integer (tf, df, N) per
    (doc, token); the corpus-level weighting core kept integral so the
    oracle is engine-exact (ln() last-ulp divergence stays out)."""
    return ta.tf_idf_stats(table(spark, sf_dir, "documents"))


@query(
    "sample-stratified-hash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             {h64_sql("'mix1' || CAST(doc_id AS VARCHAR)")} % 10000
               AS ticket
      FROM documents
    )
    SELECT doc_id, source, n_chars FROM t
    WHERE ticket < CASE source
                     WHEN 'src0' THEN 10000
                     WHEN 'src1' THEN 5000
                     WHEN 'src2' THEN 1000
                     ELSE 2500 END
    """,
)
def sample_stratified_hash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / stratified deterministic — per-source keep rates by
    portable id hash (the training-mixture primitive: 100% of src0,
    50% of src1, 10% of src2, 25% default). Same row set on every
    engine/partitioning/run; pure codegen predicate, zero shuffle."""
    from medallion_delta_lake_spark.operators import sampling

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return sampling.sample_stratified_hash(
        d,
        id_col="doc_id",
        strata_col="source",
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.1},
        default_rate=0.25,
        salt="mix1",
    )


def _langid_ngram_oracle() -> str:
    langs = list(ta.LANG_TRIGRAMS)
    tg = (
        "list_distinct(list_transform("
        f"range(1, greatest(length({NORM_SQL}) - 2, 0) + 1),"
        f" i -> substr({NORM_SQL}, CAST(i AS INT), 3)))"
    )
    score_cols = ",\n             ".join(
        "len(list_intersect(tg, ["
        + ", ".join(f"'{t}'" for t in ta.LANG_TRIGRAMS[lang])
        + f"])) AS score_{lang}"
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
    WITH d AS (SELECT doc_id, {tg} AS tg FROM documents),
    s AS (SELECT doc_id,
             {score_cols}
          FROM d)
    SELECT doc_id, {', '.join(f'score_{lang}' for lang in langs)},
           {case_sql} AS detected_lang
    FROM s
    """


@query("text-lang-id-ngram", oracle=_langid_ngram_oracle())
def text_lang_id_ngram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text-analysis / language ID via character trigrams — profile-
    overlap scoring with deterministic priority argmax; the n-gram
    flavor that survives domains where stopword lists miss."""
    return ta.language_id_ngram(table(spark, sf_dir, "documents"))


@query(
    "pack-sequences",
    # contiguous greedy packing: docs in shard order accumulate until
    # the token budget; bin = floor(preceding-cumsum / budget). The
    # whole operator is one window + one groupBy — no UDF, no loop.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             len(string_split({NORM_SQL}, ' ')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prior_tokens
      FROM d
    )
    SELECT source, CAST(prior_tokens // 2048 AS BIGINT) AS seq_bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c GROUP BY source, seq_bin
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / sequence packing — pack documents into ~2048-token
    training sequences per source shard (contiguous greedy fill in
    doc-id order). The pretraining batch-assembly step as a pure
    window plan: one shuffle on the shard key, a running decimal-free
    integer cumsum, and a grouped rollup of each bin's contents."""
    from pyspark.sql import Window as W
    from medallion_delta_lake_spark.functions.texts import tokenize

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokenize("text")).alias("n_tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "prior_tokens", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        c.withColumn(
            "seq_bin", (F.col("prior_tokens") / 2048).cast("bigint")
        )
        .groupBy("source", "seq_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "text-edit-distance",
    # candidates come from the LSH pair stage — edit distance is the
    # precise verifier for short strings (titles, names); never run it
    # all-pairs. Integer metric → exact parity.
    oracle=f"""
    WITH {_LSH_SCORED_CTE},
    good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
    texts AS (SELECT doc_id, substr({NORM_SQL}, 1, 80) AS head
              FROM corpus)
    SELECT g.id_a, g.id_b,
           CAST(levenshtein(ta.head, tb.head) AS INT) AS edit_dist
    FROM good g
    JOIN texts ta ON ta.doc_id = g.id_a
    JOIN texts tb ON tb.doc_id = g.id_b
    """,
)
def text_edit_distance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / edit distance — Levenshtein over the LSH candidate pairs'
    80-char heads (the precise fuzzy-match verifier; O(len²) per pair,
    so it only ever runs on the sub-quadratic candidate set, never
    all-pairs). Integer metric, engine-exact."""
    from medallion_delta_lake_spark.functions.texts import normalize_text

    corpus = _dup_corpus(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        corpus, n=3, num_perm=_NUM_PERM, bands=_BANDS, threshold=0.5,
        fan_out=spark.sparkContext.defaultParallelism,
    ).select("id_a", "id_b")
    texts = corpus.select(
        "doc_id", F.substring(normalize_text("text"), 1, 80).alias("head")
    )
    ta_ = texts.select(
        F.col("doc_id").alias("id_a"), F.col("head").alias("_ha")
    )
    tb_ = texts.select(
        F.col("doc_id").alias("id_b"), F.col("head").alias("_hb")
    )
    return (
        pairs.join(ta_, "id_a")
        .join(tb_, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_ha", "_hb").alias("edit_dist"),
        )
    )


@query(
    "sample-fixed-per-stratum",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {h64_sql("'eval1' || CAST(doc_id AS VARCHAR)")},
                        doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, source, n_chars FROM t WHERE rn <= 5
    """,
)
def sample_fixed_per_stratum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / fixed-n per stratum — exactly 5 docs per source by
    smallest portable-hash ticket (deterministic balanced eval-set
    construction; changing the salt draws a fresh panel). One window
    shuffle on the stratum key."""
    from pyspark.sql import Window as W
    from medallion_delta_lake_spark.functions.hashing import h64

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    ticket = h64(F.concat(F.lit("eval1"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy(ticket.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .drop("_rn")
    )


@query(
    "text-strip-boilerplate",
    # per-source boilerplate headers are planted in both engines; the
    # common prefix of a group is lcp(lexicographic MIN, MAX) — two
    # aggregates instead of an all-pairs comparison
    oracle="""
    WITH p AS (
      SELECT doc_id, source,
             'HDR-' || source || ':: ' || text AS t
      FROM documents
    ),
    g AS (
      SELECT source, MIN(t) AS a, MAX(t) AS b FROM p GROUP BY source
    ),
    l AS (
      SELECT source,
             COALESCE(list_min(list_filter(
               range(1, least(length(a), length(b)) + 1),
               i -> substr(a, CAST(i AS INT), 1)
                    <> substr(b, CAST(i AS INT), 1))),
               least(length(a), length(b)) + 1) - 1 AS prefix_len
      FROM g
    )
    SELECT p.doc_id, p.source, l.prefix_len,
           length(p.t) - l.prefix_len AS stripped_n_chars
    FROM p JOIN l ON l.source = p.source
    """,
)
def text_strip_boilerplate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / boilerplate strip — remove each source's shared header
    (the C4-style per-domain boilerplate pass). The group's common
    prefix equals lcp(lexicographic min, max) — two cheap aggregates
    and one broadcast back, never an all-pairs scan; the lcp itself is
    a declarative char-wise first-difference expression."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(F.lit("HDR-"), F.col("source"), F.lit(":: "), F.col("text"))
        .alias("t"),
    )
    g = d.groupBy("source").agg(F.min("t").alias("a"), F.max("t").alias("b"))
    ca, cb = F.split(F.col("a"), ""), F.split(F.col("b"), "")
    n = F.least(F.length("a"), F.length("b"))
    diffs = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.element_at(ca, i) != F.element_at(cb, i),
    )
    lcp = (F.coalesce(F.array_min(diffs), n + 1) - 1).alias("prefix_len")
    pl = g.select("source", lcp)
    return (
        d.join(F.broadcast(pl), "source")
        .select(
            "doc_id",
            "source",
            "prefix_len",
            (F.length("t") - F.col("prefix_len")).alias("stripped_n_chars"),
        )
    )


@query(
    "text-repetition-score",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ),
    tg AS (
      SELECT doc_id,
             list_transform(range(0, greatest(len(toks) - 2, 0) + 1),
                            i -> array_to_string(toks[i+1:i+2], ' ')) AS bgs
      FROM d
    ),
    x AS (
      SELECT doc_id, unnest(bgs) AS bg FROM tg
    ),
    c AS (
      SELECT doc_id, bg, COUNT(*) AS cnt FROM x GROUP BY doc_id, bg
    )
    SELECT doc_id,
           MAX(cnt) AS top_bigram_count,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_bigram_frac,
           CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) > 0.2 AS is_repetitive
    FROM c GROUP BY doc_id
    """,
)
def text_repetition_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / repetition — most-frequent-bigram share per document (the
    Gopher-style degenerate-text rule: 'the the the…' corpora score
    high). Explode → two grouped counts, max-over-group; integer
    counts and one final int/int division keep it engine-exact."""
    from medallion_delta_lake_spark.functions.texts import tokenize

    # NOT shingles(): that distincts — repetition needs multiplicity
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", tokenize("text").alias("tk")
    )
    bgs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size("tk") - 2, F.lit(0))
                ),
                lambda i: F.array_join(F.slice("tk", i + 1, 2), " "),
            )
        ).alias("bg"),
    )
    c = bgs.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    frac = F.max("cnt").cast("double") / F.sum("cnt")
    return c.groupBy("doc_id").agg(
        F.max("cnt").alias("top_bigram_count"),
        F.sum("cnt").alias("n_bigrams"),
        frac.alias("top_bigram_frac"),
        (frac > 0.2).alias("is_repetitive"),
    )


@query(
    "text-decontaminate",
    # benchmark = every 97th doc; train = the rest. 5-gram set overlap:
    # per-doc grams are DISTINCT (set semantics), so n_overlap counts
    # distinct contaminated grams, not instances.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(0, greatest(len(toks) - 5, 0) + 1),
               i -> array_to_string(toks[i+1:i+5], ' ')))) AS gram
      FROM d
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    hits AS (
      SELECT g.doc_id, COUNT(*) AS n_overlap
      FROM g JOIN bench USING (gram)
      WHERE g.doc_id % 97 <> 0
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           COALESCE(h.n_overlap, 0) > 0 AS is_contaminated
    FROM d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 97 <> 0
    """,
)
def text_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / decontamination — flag training docs sharing any 5-gram
    with a benchmark split (train/test-overlap scrub). The benchmark
    gram set broadcasts; the training side never shuffles for the
    probe. Fixture split: doc_id % 97 == 0 is the 'benchmark'."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return dedup.decontaminate(train, bench, "text", "doc_id", n=5)


@query(
    "dedup-paragraph-blocks",
    # 20-token chunk hashes; a chunk instance is duplicated when its
    # hash occurs >= 2 times corpus-wide (same-doc repeats included)
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ),
    b AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(len(toks) / 20.0) AS BIGINT)),
               i -> {h64_sql("array_to_string(toks[i*20+1:(i+1)*20], ' ')")}
             )) AS bh
      FROM d
    ),
    c AS (SELECT bh, COUNT(*) AS c FROM b GROUP BY bh)
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           CAST(SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_blocks,
           CAST(SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_frac
    FROM b JOIN c USING (bh)
    GROUP BY doc_id
    """,
)
def dedup_paragraph_blocks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / sub-document blocks — per-doc fraction of 20-token
    chunks that occur elsewhere in the corpus (boilerplate signal that
    whole-document dedup misses). Chunks shuffle as 8-byte hashes."""
    return dedup.block_dedup_stats(
        table(spark, sf_dir, "documents"), "text", "doc_id", block=20
    )


@query(
    "mixture-token-budget",
    oracle=f"""
    WITH t AS (
      SELECT source,
             CAST(SUM(len({TOKS_SQL})) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source
    )
    SELECT source, total_tokens,
           CAST(MIN(total_tokens) OVER () AS DOUBLE)
             / CAST(total_tokens AS DOUBLE) AS keep_rate
    FROM t
    """,
)
def mixture_token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / mixture planning — per-source token totals plus the
    keep rate equalizing every source to the smallest source's token
    budget (feeds sample_stratified_hash). One grouped agg + broadcast
    scalar join."""
    from medallion_delta_lake_spark.operators import sampling

    return sampling.mixture_token_budget(
        table(spark, sf_dir, "documents"), "text", "source"
    )


@query(
    "text-token-typicality",
    # group by the same h64 token hash as the engine so both sides see
    # identical (collision-included) equivalence classes
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ),
    x AS (
      SELECT doc_id, {h64_sql('tok')} AS th
      FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
    ),
    c AS (SELECT th, COUNT(*) AS c FROM x GROUP BY th)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(c.c) AS BIGINT) AS freq_sum,
           CAST(SUM(c.c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS typicality
    FROM x JOIN c USING (th)
    GROUP BY doc_id
    """,
)
def text_token_typicality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / typicality — mean corpus-frequency of each document's
    tokens (unigram-LM proxy; flags gibberish and stopword soup).
    Tokens shuffle as bigint hashes; int/int division keeps the score
    engine-exact."""
    return ta.token_typicality(
        table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def _containment_sql(threshold: float) -> str:
    # same DEFAULT_MAX_DF candidate cap as _jaccard_sql
    inter = "len(list_intersect(sa.sh, sb.sh))"
    return f"""
    postings AS (SELECT doc_id, unnest(sh) AS shingle_hash FROM sets),
    kept AS (
      SELECT shingle_hash FROM postings
      GROUP BY shingle_hash HAVING COUNT(*) <= {dedup.DEFAULT_MAX_DF}
    ),
    capped AS (
      SELECT p.doc_id, p.shingle_hash
      FROM postings p JOIN kept k USING (shingle_hash)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM capped a JOIN capped b
        ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT p.id_a, p.id_b,
             CAST({inter} AS DOUBLE)
               / CAST(least(len(sa.sh), len(sb.sh)) AS DOUBLE)
               AS containment
      FROM pairs p
      JOIN sets sa ON sa.doc_id = p.id_a
      JOIN sets sb ON sb.doc_id = p.id_b
    )
    SELECT id_a, id_b, containment FROM scored
    WHERE containment >= {threshold}
    """


@query(
    "dedup-containment",
    oracle=f"WITH {_SETS_CTE}, {_containment_sql(0.8)}",
)
def dedup_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / asymmetric containment — |A∩B| / min(|A|,|B|) over
    3-gram shingle sets ≥ 0.8: flags a document contained in a larger
    one (quote/concatenation duplication) that symmetric Jaccard
    misses. Same inverted-index candidate generation as the Jaccard
    query; the planted near-dup pairs (original ⊂ original+tail) score
    exactly 1.0 here."""
    return dedup.containment_pairs(
        _dup_corpus(spark, sf_dir),
        n=3,
        threshold=0.8,
        fan_out=spark.sparkContext.defaultParallelism,
    )


@query(
    "corpus-shuffle-shards",
    # the permutation is decided by the 8-byte ticket alone: ROW_NUMBER
    # per shard over (ticket, id) — document text never sorts
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             {h64_sql("'shuf0' || CAST(doc_id AS VARCHAR)")} AS ticket
      FROM documents
    )
    SELECT doc_id, source,
           ticket % 8 AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY ticket % 8 ORDER BY ticket, doc_id
           ) AS INT) AS shard_pos
    FROM t
    """,
)
def corpus_shuffle_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / deterministic training-order shuffle — assign every
    document a hash-balanced shard and a reproducible pseudo-random
    position within it (the corpus → data-loader-shards step; a new
    salt = a new epoch order). One narrow shuffle of (id, ticket)
    pairs; see operators/sampling.py:shuffle_shards for the 100 TB
    shape."""
    from medallion_delta_lake_spark.operators import sampling

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    out = sampling.shuffle_shards(d, id_col="doc_id", n_shards=8)
    return out.select("doc_id", "source", "shard", "shard_pos")


@query(
    "split-train-holdout",
    # split is a pure function of (salt, id): cumulative portable-hash
    # thresholds 98% / 1% / 1% — stable across corpus regenerations,
    # which is what keeps eval docs from leaking into train
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {h64_sql("'split0' || CAST(doc_id AS VARCHAR)")} % 10000
               AS ticket,
             len({TOKS_SQL}) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT CASE WHEN ticket < 9800 THEN 'train'
                  WHEN ticket < 9900 THEN 'val'
                  ELSE 'test' END AS split,
             n_tokens
      FROM t
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY split
    """,
)
def split_train_holdout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / deterministic train-val-test split — assign each
    document a split by cumulative portable-hash threshold
    (98/1/1) and audit per-split document and token totals. The
    assignment is zero-shuffle per-row codegen; the audit is one tiny
    grouped aggregate with map-side combine."""
    from medallion_delta_lake_spark.operators import sampling
    from medallion_delta_lake_spark.functions.texts import tokenize

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize("text")).alias("n_tokens")
    )
    s = sampling.assign_split(
        d, id_col="doc_id",
        fractions={"train": 0.98, "val": 0.01, "test": 0.01},
    )
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


@query(
    "split-leakage-audit",
    # near-dup pairs whose endpoints land in different deterministic
    # splits: the eval-contamination detector. Split assignment is the
    # same cumulative portable-hash CASE as split-train-holdout
    # (80/10/10 here so the small corpus yields crossings).
    oracle=f"""
    WITH {_LSH_SCORED_CTE},
    sp AS (
      SELECT doc_id,
             CASE WHEN {h64_sql("'split0' || CAST(doc_id AS VARCHAR)")}
                       % 10000 < 8000 THEN 'train'
                  WHEN {h64_sql("'split0' || CAST(doc_id AS VARCHAR)")}
                       % 10000 < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM corpus
    )
    SELECT s.id_a, s.id_b, s.jaccard,
           sa.split AS split_a, sb.split AS split_b
    FROM scored s
    JOIN sp sa ON sa.doc_id = s.id_a
    JOIN sp sb ON sb.doc_id = s.id_b
    WHERE s.jaccard >= 0.5 AND sa.split <> sb.split
    """,
)
def split_leakage_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup+sampling / train-eval leakage audit — LSH-verified
    near-dup pairs crossing a split boundary (the near-copy-of-a-test-
    doc-in-train detector). Candidate generation is the banded LSH
    pass; split labels attach via two narrow id joins."""
    from medallion_delta_lake_spark.operators import sampling

    corpus = _dup_corpus(spark, sf_dir)
    labeled = sampling.assign_split(
        corpus, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return dedup.split_leakage_pairs(
        labeled,
        n=3,
        num_perm=_NUM_PERM,
        bands=_BANDS,
        threshold=0.5,
        fan_out=spark.sparkContext.defaultParallelism,
    )


@query(
    "text-ngram-freq",
    # word-count over exploded trigrams; HAVING keeps the head of the
    # Zipf curve (the long singleton tail never leaves the aggregate)
    oracle=f"""
    WITH d AS (SELECT {TOKS_SQL} AS toks FROM documents),
    g AS (
      SELECT unnest(list_transform(range(0, len(toks) - 3 + 1),
                    i -> array_to_string(toks[i+1:i+3], ' '))) AS ngram
      FROM d WHERE len(toks) >= 3
    )
    SELECT ngram, COUNT(*) AS freq
    FROM g GROUP BY ngram HAVING COUNT(*) >= 2
    """,
)
def text_ngram_freq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / corpus n-gram statistics — trigram frequency table with a
    min-count floor (KenLM-style count collection / collocation
    mining). One explode + one grouped count with map-side combine —
    the word-count plan over grams."""
    return ta.ngram_freq(
        table(spark, sf_dir, "documents"), n=3, min_count=2
    )


@query(
    "text-quality-calibrate",
    # exact type-1 lower quartile per source: rank floor((n-1)/4)+1
    # under (score, doc_id) order — integer-exact, no interpolation
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {NORM_SQL} AS norm, {TOKS_SQL} AS toks
      FROM documents
    ), m AS (
      SELECT doc_id, source,
             length(norm) AS n_chars,
             len(toks) AS n_tokens,
             length(regexp_replace(norm, '[^a-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(norm, '[^0-9]', '', 'g')) AS n_digit,
             length(regexp_replace(norm, '[^ ]', '', 'g')) AS n_space,
             {_sw_hits_sql('toks', ta.STOPWORDS['en'])} AS sw
      FROM d
    ),
    sc AS (
      SELECT doc_id, source,
           CAST(
             (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 25 ELSE 0 END)
           + (CASE WHEN CAST(sw AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.05
                   THEN 25 ELSE 0 END)
           + (CASE WHEN CAST(n_chars - n_alpha - n_digit - n_space AS DOUBLE)
                        / CAST(n_chars AS DOUBLE) <= 0.2
                   THEN 25 ELSE 0 END)
           + (CASE WHEN CAST(n_chars - n_tokens + 1 AS DOUBLE)
                        / CAST(n_tokens AS DOUBLE) BETWEEN 3.0 AND 10.0
                   THEN 25 ELSE 0 END) AS INT) AS quality_score
      FROM m
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY quality_score, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM sc
    ),
    q AS (
      SELECT source, n AS n_docs, quality_score AS q25
      FROM r WHERE rn = (n - 1) // 4 + 1
    )
    SELECT sc.source, q.n_docs, q.q25,
           CAST(SUM(CASE WHEN sc.quality_score < q.q25 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below
    FROM sc JOIN q ON q.source = sc.source
    GROUP BY sc.source, q.n_docs, q.q25
    """,
)
def text_quality_calibrate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / per-source quality calibration — exact lower-quartile
    cutoff + below-count per source (the adaptive-threshold planning
    step before the quality gate; one window shuffle on the stratum
    key, broadcast rejoin of the tiny quartile frame)."""
    return ta.quality_calibrate(table(spark, sf_dir, "documents"))


@query(
    "sample-importance-weighted",
    oracle=f"""
    SELECT doc_id, source, n_chars FROM documents
    WHERE {h64_sql("'imp1' || CAST(doc_id AS VARCHAR)")} % 10000
          < floor(least(CAST(1.0 AS DOUBLE),
                        n_chars / CAST(2000.0 AS DOUBLE))
                  * CAST(10000.0 AS DOUBLE))
    """,
)
def sample_importance_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / importance-weighted — every document kept with its
    OWN probability (here length-derived quality, capped at 1.0): the
    quality-weighted downsampling step of a training mixture, by
    portable hash instead of RNG so the kept set is identical on any
    engine/partitioning/rerun. Pure codegen predicate, zero shuffle
    (operators/sampling.py:sample_by_weight)."""
    from medallion_delta_lake_spark.operators.sampling import sample_by_weight

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    weight = F.least(
        F.lit(1.0), F.col("n_chars") / F.lit(2000.0)
    )
    return sample_by_weight(d, "doc_id", weight, salt="imp1")


_URL_SQL = (
    "('HTTPS://WWW.' || source || '.Example.COM/Articles/Doc'"
    " || CAST(doc_id % 40 AS VARCHAR)"
    " || CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN '?utm_source=feed'"
    " WHEN 1 THEN '/' WHEN 2 THEN '#section-2' ELSE '' END)"
)


@query(
    "dedup-url-canonical",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_URL_SQL} AS url FROM documents
    ),
    c AS (
      SELECT doc_id, {ta.canonicalize_url_sql('url')} AS canonical_url
      FROM u
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM c GROUP BY canonical_url
    """,
)
def dedup_url_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / URL canonicalization — crawl URLs collapsed onto their
    canonical key (case-folded host, www/query/fragment/trailing-slash
    stripped; path case preserved) and grouped to dup-sets with the
    smallest doc_id as representative. The pre-content-hash dedup of
    every crawl pipeline; canonicalization is a zero-shuffle codegen
    regexp chain, the groupBy ships only (url, id)
    (operators/text_analysis.py:canonicalize_url)."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.COM/Articles/Doc"),
        (F.col("doc_id") % 40).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, "?utm_source=feed")
        .when(F.col("doc_id") % 4 == 1, "/")
        .when(F.col("doc_id") % 4 == 2, "#section-2")
        .otherwise(""),
    )
    c = d.select(
        "doc_id", ta.canonicalize_url(url).alias("canonical_url")
    )
    return c.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        F.min("doc_id").cast("bigint").alias("keep_doc_id"),
    )


_HTML_WRAP_SQL = (
    "('<html><head><script type=\"text/javascript\">var x = 1;"
    "</script><style>p { color: red; }</style></head>"
    "<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>"
    "<p class=\"main\">' || text || ' &amp; more &lt;tags&gt;</p>"
    "</body></html>')"
)


@query(
    "text-html-strip",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_HTML_WRAP_SQL} AS html FROM documents
    ),
    s AS (
      SELECT doc_id, html,
        regexp_replace(regexp_replace(regexp_replace(html,
          '(?is)<script[^>]*>.*?</script\\s*>', ' ', 'g'),
          '(?is)<style[^>]*>.*?</style\\s*>', ' ', 'g'),
          '<[^>]+>', ' ', 'g') AS detagged
      FROM h
    ),
    e AS (
      SELECT doc_id, html,
        replace(replace(replace(replace(replace(detagged,
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
          '&#39;', chr(39)), '&amp;', '&') AS decoded
      FROM s
    )
    SELECT doc_id,
           trim(regexp_replace(decoded, '\\s+', ' ', 'g')) AS text_clean,
           CAST(len(string_split_regex(html, '<[^>]+>')) - 1 AS INT)
             AS n_tags,
           length(trim(regexp_replace(decoded, '\\s+', ' ', 'g')))
             AS clean_len
    FROM e
    """,
)
def text_html_strip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / HTML→text extraction — documents wrapped in a planted
    HTML shell (script+style elements, tags, entities), then stripped:
    script/style dropped with contents, tags removed, the five XML
    entities decoded (amp last), whitespace collapsed; n_tags doubles
    as a markup-density signal. The WET-extraction pass of a crawl
    pipeline as pure RE2-portable codegen — zero shuffle
    (operators/text_analysis.py:strip_html)."""
    d = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            '<html><head><script type="text/javascript">var x = 1;'
            "</script><style>p { color: red; }</style></head>"
            "<body><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit('</h1><p class="main">'),
        F.col("text"),
        F.lit(" &amp; more &lt;tags&gt;</p></body></html>"),
    )
    stripped = ta.strip_html(
        d.select("doc_id", html.alias("html")), "html", "text_clean"
    )
    return stripped.select(
        "doc_id",
        "text_clean",
        "n_tags",
        F.length("text_clean").alias("clean_len"),
    )


@query(
    "sample-temperature-mixture",
    oracle=f"""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    m AS (SELECT MIN(n) AS mn FROM c),
    r AS (
      SELECT source,
             least(CAST(1.0 AS DOUBLE),
                   sqrt(CAST(n AS DOUBLE) * CAST(mn AS DOUBLE))
                     / CAST(n AS DOUBLE)) AS keep_rate
      FROM c, m
    )
    SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
    WHERE {h64_sql("'temp1' || CAST(doc_id AS VARCHAR)")} % 10000
          < floor(keep_rate * CAST(10000.0 AS DOUBLE))
    """,
)
def sample_temperature_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / temperature-scaled mixture (T = 0.5) — per-source
    keep rates ∝ √n so dominant sources shrink toward the √-law share
    while the smallest keeps 100% (the multilingual rebalancing rule),
    applied by portable hash. T fixed at 0.5 because sqrt is correctly
    rounded IEEE (pow is not) — the oracle stays exact
    (operators/sampling.py:sample_temperature_mixture)."""
    from medallion_delta_lake_spark.operators.sampling import (
        sample_temperature_mixture,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    return sample_temperature_mixture(
        d, "doc_id", "source", salt="temp1"
    ).select("doc_id", "source")


@query(
    "text-vocab-overlap",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT source AS s, t FROM (
        SELECT source, unnest({TOKS_SQL}) AS t FROM documents
      ) WHERE t <> ''
    ),
    sizes AS (SELECT s, COUNT(*) AS n FROM tok GROUP BY s),
    inter AS (
      SELECT a.s AS src_a, b.s AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM tok a JOIN tok b ON a.t = b.t AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT src_a, src_b, n_common,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_common AS DOUBLE)
             / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.s = src_a
    JOIN sizes sb ON sb.s = src_b
    """,
)
def text_vocab_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / cross-source vocabulary overlap — pairwise distinct-token
    intersection + Jaccard between corpus sources (near-identical
    vocabularies flag duplicate feeds; disjoint ones, domain shift —
    the pre-mixing corpus diagnostic). Token-keyed postings join,
    never documents (operators/text_analysis.py:vocab_overlap)."""
    d = table(spark, sf_dir, "documents").select("source", "text")
    return ta.vocab_overlap(d, "text", "source")


@query(
    "sample-mixture-epochs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CASE WHEN source = 'src0' THEN 2.5
                  WHEN source = 'src1' THEN 0.4
                  WHEN source = 'src2' THEN 0.0
                  ELSE 1.0 END AS e
      FROM documents
    ),
    c AS (
      SELECT doc_id, source,
             CAST(floor(e) AS BIGINT)
             + CASE WHEN {h64_sql("'ep7' || CAST(doc_id AS VARCHAR)")}
                         % 10000
                         < floor((e - floor(e))
                                 * CAST(10000.0 AS DOUBLE))
                    THEN 1 ELSE 0 END AS n
      FROM d
    )
    SELECT doc_id, source,
           CAST(unnest(range(0, n)) AS BIGINT) AS epoch_idx
    FROM c WHERE n > 0
    """,
)
def sample_mixture_epochs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / fractional-epoch mixture — materialize "2.5 epochs
    of src0, 0.4 of src1, 0 of src2, 1 of the rest": floor(e) full
    copies per doc plus a portable-hash-decided extra for the
    fraction, each tagged ``epoch_idx``. The UPSAMPLING half of
    mixture planning (stratified-hash only downsamples) — the emitted
    multiset is a pure function of (salt, doc_id), reproducible on
    any engine/partitioning. Zero shuffle: CASE + hash predicate +
    explode(sequence), all codegen
    (operators/sampling.py:mixture_epochs)."""
    from medallion_delta_lake_spark.operators.sampling import (
        mixture_epochs,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_epochs(
        d,
        "doc_id",
        "source",
        {"src0": 2.5, "src1": 0.4, "src2": 0.0},
        default_epochs=1.0,
        salt="ep7",
    )


@query(
    "dedup-cc-bigstar",
    # same transitive-closure truth as dedup-cluster-assign: cluster =
    # MIN over the reachable set (recursive CTE); the thing under test
    # is the ALTERNATE distributed algorithm, not different semantics
    oracle=f"""
    WITH RECURSIVE {_LSH_SCORED_CTE},
    good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM good
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM good
    ),
    walk(doc_id, node) AS (
      SELECT doc_id, doc_id AS node FROM corpus
      UNION
      SELECT w.doc_id, e.dst AS node
      FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT doc_id, MIN(node) AS cluster FROM walk GROUP BY doc_id
    """,
)
def dedup_cc_bigstar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup / connected components by large-star/small-star
    contraction (Kiveris et al. SoCC'14) over the MinHash-LSH pair
    graph — the O(log n)-round alternative to dedup-cluster-assign's
    O(diameter) min-label propagation, for graphs with long chains
    (VERDICT r7 #7). Identical output contract (doc → component
    minimum), verified against the same recursive-CTE oracle and a
    union-find reference + 512-node path graph in
    tests/test_dedup_clusters.py."""
    corpus = _dup_corpus(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        corpus,
        n=3,
        num_perm=_NUM_PERM,
        bands=_BANDS,
        threshold=0.5,
        fan_out=spark.sparkContext.defaultParallelism,
    )
    return dedup.neardup_clusters_star(corpus.select("doc_id"), pairs)


@query(
    "text-zipf-profile",
    # integer rank·freq products, not a fitted log-log slope: ln()
    # drifts by ulps across libms, integer products are engine-exact
    oracle=f"""
    WITH toks AS (
      SELECT unnest({TOKS_SQL}) AS token FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY token),
    ranked AS (
      SELECT token, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rank
      FROM freq
    ),
    top AS (SELECT * FROM ranked WHERE rank <= 50),
    head AS (SELECT freq AS head_freq FROM top WHERE rank = 1)
    SELECT CAST(rank AS INT) AS rank, token, freq,
           rank * freq AS rank_freq,
           rank * freq - head_freq AS dev_from_head
    FROM top, head
    """,
)
def text_zipf_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / Zipf rank–frequency profile — the top-50 token head with
    rank·frequency products (Zipf predicts ≈constant) and deviation
    from the rank-1 value: the corpus-composition drift check run
    before and after every big ingest (boilerplate flooding spikes
    the low-rank products; truncation collapses the tail). One
    explode + grouped count; the singleton tail never leaves the
    aggregate (operators/text_analysis.py:zipf_profile)."""
    return ta.zipf_profile(table(spark, sf_dir, "documents"), top_k=50)


@query(
    "text-ngram-novelty",
    # distinct-trigram doc-frequency: a doc's novelty = share of its
    # distinct trigrams appearing in NO other doc. DRIVER FACE IS
    # ALL-INTEGER (r8/r9 driver-red settlement): novelty rides as
    # novelty_q6 = n_novel·10⁶ // n_grams (exact integer division —
    # the former one-division double was hash-red two driver rounds
    # running yet locally green). Oracle trigrams are built from
    # EXPLICIT 1-based element access t[i+1]||' '||t[i+2]||' '||t[i+3]
    # rather than list slicing, whose bound semantics have shifted
    # across DuckDB versions — element access has not
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKS_SQL} AS t FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(0, len(t) - 3 + 1),
                    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
               AS ngram
      FROM toks WHERE len(t) >= 3
    ),
    df AS (SELECT ngram, COUNT(*) AS ndocs FROM g GROUP BY ngram)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN df.ndocs = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN df.ndocs = 1 THEN 1 ELSE 0 END)
             * 1000000 // COUNT(*) AS BIGINT) AS novelty_q6
    FROM g JOIN df USING (ngram)
    GROUP BY g.doc_id
    """,
)
def text_ngram_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / n-gram novelty — per document, the fraction of its
    distinct trigrams that occur in NO other document: the
    memorization-risk / boilerplate dial (novelty ≈ 0 is templated or
    duplicated content; ≈ 1 is unique prose) used to weight training
    mixtures. One explode + distinct, one trigram doc-frequency
    aggregate, one hash join back on the gram id — text itself never
    joins; at 100 TB the df table is the corpus vocabulary, shuffled
    once with map-side combine."""
    from medallion_delta_lake_spark.functions.texts import tokenize
    from medallion_delta_lake_spark.operators.agg import q_div

    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("t")).filter(
        F.size("t") >= 3
    )
    g = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3), "
                "i -> concat_ws(' ', slice(t, i + 1, 3)))"
            )
        ).alias("ngram"),
    ).distinct()
    dfreq = g.groupBy("ngram").agg(F.count(F.lit(1)).alias("ndocs"))
    return (
        g.join(dfreq, "ngram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("ndocs") == 1, 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            q_div(F.col("n_novel"), F.col("n_grams"), 6).alias(
                "novelty_q6"
            ),
        )
    )


@query(
    "sample-quality-audit",
    # per-type KS distance between the 10% portable-hash sample and
    # the rest: integer cumulative counts, one IEEE division per row
    oracle=f"""
    WITH flagged AS (
      SELECT event_type, value,
             {h64_sql("'qa' || CAST(event_id AS VARCHAR)")} % 10 = 0
               AS in_sample
      FROM events
    ),
    per_val AS (
      SELECT event_type, value,
             SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN in_sample THEN 0 ELSE 1 END) AS b
      FROM flagged GROUP BY event_type, value
    ),
    cum AS (
      SELECT event_type,
             SUM(a) OVER w AS ca, SUM(b) OVER w AS cb,
             SUM(a) OVER p AS na, SUM(b) OVER p AS nb
      FROM per_val
      WINDOW w AS (PARTITION BY event_type ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             p AS (PARTITION BY event_type)
    )
    SELECT event_type,
           MAX(abs(CAST(ca AS DOUBLE) / na
                   - CAST(cb AS DOUBLE) / nb)) AS ks_stat,
           CAST(MAX(na) AS BIGINT) AS n_sample,
           CAST(MAX(nb) AS BIGINT) AS n_rest
    FROM cum GROUP BY event_type
    """,
)
def sample_quality_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling / sample-bias audit — per event type, the KS distance
    between the deterministic 10% hash sample and the remaining 90% of
    the value distribution: the QA gate that catches a sampling key
    correlated with the measure (the classic silent bias when sampling
    by an id that encodes time or shard). Hash-flag → per-(type,value)
    counts → one keyed cumulative window over the DISTINCT-value
    table — the raw rows shuffle once, pre-aggregated with map-side
    combine."""
    from medallion_delta_lake_spark.functions.hashing import h64
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    flagged = e.select(
        "event_type",
        "value",
        (
            F.pmod(
                h64(F.concat(F.lit("qa"), F.col("event_id").cast("string"))),
                F.lit(10),
            )
            == 0
        ).alias("in_sample"),
    )
    per_val = flagged.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("in_sample"), 0).otherwise(1)).alias("b"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    p = W.partitionBy("event_type")
    cum = per_val.select(
        "event_type",
        F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb"),
        F.sum("a").over(p).alias("na"),
        F.sum("b").over(p).alias("nb"),
    )
    return cum.groupBy("event_type").agg(
        F.max(
            F.abs(
                F.col("ca").cast("double") / F.col("na")
                - F.col("cb").cast("double") / F.col("nb")
            )
        ).alias("ks_stat"),
        F.max("na").cast("bigint").alias("n_sample"),
        F.max("nb").cast("bigint").alias("n_rest"),
    )


@query(
    "join-fuzzy-blocked",
    # blocked edit-distance join: candidates meet on (length bucket ±,
    # first char) keys — never all-pairs — then exact levenshtein ≤ 2
    # verifies (identical integer DP in both engines)
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT unnest({TOKS_SQL}) AS word FROM documents
    ),
    t AS (
      SELECT word, length(word) AS ln, substr(word, 1, 1) AS c1
      FROM w WHERE length(word) >= 4
    ),
    cand AS (
      SELECT a.word AS word_a, b.word AS word_b
      FROM t a JOIN t b
        ON a.c1 = b.c1 AND b.ln BETWEEN a.ln - 2 AND a.ln + 2
       AND a.word < b.word
    )
    SELECT word_a, word_b,
           CAST(levenshtein(word_a, word_b) AS INT) AS dist
    FROM cand
    WHERE levenshtein(word_a, word_b) <= 2
    """,
)
def join_fuzzy_blocked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join / blocked fuzzy (edit-distance ≤ 2) self-join over the
    corpus vocabulary — the typo/variant clustering primitive
    (query normalization, OCR cleanup, vocab merging). The naive
    spelling is an all-pairs levenshtein (quadratic in vocabulary);
    blocking on (first char, ±2 length band) turns it into an
    equi-join on the char with a band predicate — candidates are
    block-local, and only they pay the O(mn) distance DP. At 100 TB
    the vocabulary (not the corpus) is the join input, shuffled once
    by block key."""
    from medallion_delta_lake_spark.functions.texts import tokenize

    docs = table(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(tokenize("text")).alias("word"))
        .distinct()
        .filter(F.length("word") >= 4)
        .select(
            "word",
            F.length("word").alias("ln"),
            F.substring("word", 1, 1).alias("c1"),
        )
    )
    a = w.select(
        F.col("word").alias("word_a"),
        F.col("ln").alias("ln_a"),
        "c1",
    )
    b = w.select(
        F.col("word").alias("word_b"),
        F.col("ln").alias("ln_b"),
        "c1",
    )
    cand = a.join(b, "c1").filter(
        (F.col("ln_b") >= F.col("ln_a") - 2)
        & (F.col("ln_b") <= F.col("ln_a") + 2)
        & (F.col("word_a") < F.col("word_b"))
    )
    return (
        cand.select(
            "word_a",
            "word_b",
            F.levenshtein("word_a", "word_b").alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )


@query(
    "udtf-chunk-windows",
    # overlapping 10-word windows, stride 5 — the DuckDB twin slices
    # the token list at the same starts; strings + ints only
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(0, 1 + greatest(len(toks) - 1, 0) // 5))
               AS i
      FROM d
    ),
    c AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             array_to_string(toks[i * 5 + 1 : i * 5 + 10], ' ')
               AS chunk,
             CAST(len(toks[i * 5 + 1 : i * 5 + 10]) AS INT) AS n_words
      FROM idx WHERE i * 5 < len(toks)
    )
    SELECT doc_id, chunk_idx, chunk, n_words FROM c
    """,
)
def udtf_chunk_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """udtf / overlapping context chunks — every document split into
    10-word windows starting every 5 words (the RAG chunking shape:
    overlap keeps boundary-straddling answers intact), via an
    Arrow-optimized Python UDTF in a LATERAL join — the §2.11 UDTF
    surface (one row → variable structured rows with imperative
    boundary logic). Arrow batching keeps it vectorized; the chunk
    explosion runs inside the scan stage, nothing shuffles
    (operators/pandas_ops.py:chunk_windows_udtf)."""
    from medallion_delta_lake_spark.operators.pandas_ops import (
        chunk_windows_udtf,
    )

    spark.udtf.register("chunk_windows", chunk_windows_udtf())
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_docs_for_chunks"
    )
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_words "
        "FROM _docs_for_chunks d, "
        "LATERAL chunk_windows(d.text, 10, 5) c"
    )


@query(
    "text-top-terms",
    # keyword extraction: integer rarity score tf * ((N*1e6) div df)
    # (order-equivalent to tf*N/df; ln() stays out of the engines),
    # deterministic top-3 per doc
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ),
    toks AS (SELECT doc_id, unnest(toks) AS token FROM d),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf
           FROM toks GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    sc AS (
      SELECT t.doc_id, t.token, t.tf,
             t.tf * ((n.n_docs * 1000000) // f.df) AS score
      FROM tf t JOIN dfreq f ON f.token = t.token, n
    ),
    r AS (
      SELECT doc_id, token, tf, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY score DESC, token) AS rank
      FROM sc
    )
    SELECT doc_id, token, tf, score, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def text_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text / keyword extraction — each document's 3 most
    characteristic terms by an integer rarity score
    tf · ⌊N·10⁶/df⌋ (rank-equivalent to tf·N/df, the tf-idf core
    with the engine-unsafe ln() removed and integrality kept, so the
    top-k is engine-exact). The topic-labeling / index-card primitive
    for corpus curation. One explode + two token-keyed aggregations +
    a doc-partitioned rank window — the tf-idf-stats plan plus one
    bounded window."""
    from medallion_delta_lake_spark.operators.text_analysis import (
        tf_idf_stats,
    )
    from pyspark.sql import Window as W

    stats = tf_idf_stats(table(spark, sf_dir, "documents"))
    sc = stats.select(
        "doc_id",
        "token",
        "tf",
        (
            F.col("tf")
            * F.expr("(n_docs * 1000000) div df")
        ).alias("score"),
    )
    r = sc.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(
                F.col("score").desc(), "token"
            )
        ),
    )
    return r.filter(F.col("rank") <= 3).withColumn(
        "rank", F.col("rank").cast("int")
    )
