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

from medallion_delta_lake_spark.functions.hashing import (
    h64_sql,
    rolling_fingerprint_sql,
)
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
