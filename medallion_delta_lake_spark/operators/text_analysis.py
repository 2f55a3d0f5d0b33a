"""Text-analysis operators for LLM training-data pipelines.

Extension surface beyond the reference (SURVEY.md §2.11): language ID,
quality scoring, token counting, document fingerprinting — the
pre-training corpus hygiene passes a 100 TB documents table needs.

Everything is a narrow projection of native Catalyst expressions:
per-row, no shuffle, no Python UDF, fully inside whole-stage codegen —
the shape that scales linearly with executors. Determinism contract:
all scores are integer counts or int/int double divisions (IEEE-exact
in any engine), so the DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.hashing import h64, rolling_fingerprint
from medallion_delta_lake_spark.functions.texts import (
    _c,
    normalize_text,
    tokenize,
)

# BPE-ish word/number/symbol tokenizer (shared literal with the SQL
# oracle; subset of regex syntax where Java regex and RE2 agree).
REGEX_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Minimal per-language stopword profiles for the n-gram/stopword
# language-ID heuristic. Tie-break priority = dict order.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "y", "que", "en", "los", "se", "un", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "zu", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "pour", "dans", "est"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "他"],
}


def _stopword_hits(tokens: Column, words: Sequence[str]) -> Column:
    """Number of tokens (with duplicates) in ``words``."""
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wl, t)))


def token_stats(
    df: DataFrame, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """Per-document token counting: whitespace tokens, distinct tokens,
    regex (BPE-ish) tokens, char length, mean token length."""
    norm = normalize_text(text_col)
    toks = tokenize(text_col)
    n_toks = F.size(toks)
    return df.select(
        *id_cols,
        F.length(norm).alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(REGEX_TOKEN_PATTERN), 0)).alias(
            "n_regex_tokens"
        ),
        (
            (F.length(norm) - n_toks + 1).cast("double") / n_toks.cast("double")
        ).alias("mean_token_len"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """Heuristic document quality: char-class ratios + stopword density
    folded into a 0–100 integer score (quartile rubric: length band,
    stopword density, punctuation restraint, token-shape band)."""
    norm = normalize_text(text_col)
    toks = tokenize(text_col)
    n_chars = F.length(norm)
    n_alpha = F.length(F.regexp_replace(norm, "[^a-z]", ""))
    n_digit = F.length(F.regexp_replace(norm, "[^0-9]", ""))
    n_space = F.length(F.regexp_replace(norm, "[^ ]", ""))
    n_punct = n_chars - n_alpha - n_digit - n_space
    n_toks = F.size(toks)
    sw = _stopword_hits(toks, STOPWORDS["en"])
    stop_ratio = sw.cast("double") / n_toks.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    mean_tok = (n_chars - n_toks + 1).cast("double") / n_toks.cast("double")
    score = (
        F.when((n_chars >= 100) & (n_chars <= 2000), 25).otherwise(0)
        + F.when(stop_ratio >= 0.05, 25).otherwise(0)
        + F.when(punct_ratio <= 0.2, 25).otherwise(0)
        + F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), 25).otherwise(0)
    )
    return df.select(
        *id_cols,
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_tok.alias("mean_token_len"),
        score.cast("int").alias("quality_score"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """Stopword-profile language ID: per-language stopword hit counts,
    argmax with deterministic priority-order tie-break (first language
    in STOPWORDS wins ties). Unknown (all-zero) → 'und'."""
    toks = tokenize(text_col)
    scores = {
        lang: _stopword_hits(toks, words) for lang, words in STOPWORDS.items()
    }
    langs = list(STOPWORDS)
    detected = F.lit("und")
    # build the CASE chain back-to-front so earlier langs take priority
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        detected = F.when(cond, F.lit(lang)).otherwise(detected)
    return df.select(
        *id_cols,
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        detected.alias("detected_lang"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """Document fingerprints: order-sensitive polynomial rolling hash
    over tokens + order-free content hash of the normalized text.
    Replaces full-text equality in exact dedup at 100 TB — groupBy on a
    60-bit fingerprint shuffles 8 bytes/doc instead of whole documents."""
    return df.select(
        *id_cols,
        rolling_fingerprint(tokenize(text_col)).alias("fingerprint"),
        h64(normalize_text(text_col)).alias("content_hash"),
    )


# PII-ish patterns, deliberately restricted to syntax that parses
# identically in Java regex (Spark) and RE2 (DuckDB): character
# classes, +/{n,} quantifiers, no lookaround/backrefs.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_PATTERN = r"[0-9]{6,}"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "scrubbed",
    keep_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Redact email addresses and long digit runs from a text column —
    the pre-training privacy scrub pass. Pure codegen regexp_replace
    (two passes, email first so its digits don't half-match), plus
    per-row redaction counts for auditing. Zero shuffle."""
    emails_scrubbed = F.regexp_replace(
        _c(text_col), EMAIL_PATTERN, "<EMAIL>"
    )
    scrubbed = F.regexp_replace(
        emails_scrubbed, LONG_NUMBER_PATTERN, "<NUM>"
    )
    n_emails = F.size(
        F.split(_c(text_col), EMAIL_PATTERN, -1)
    ) - 1
    n_nums = F.size(F.split(emails_scrubbed, LONG_NUMBER_PATTERN, -1)) - 1
    return df.select(
        *[F.col(c) for c in keep_cols],
        scrubbed.alias(out_col),
        n_emails.cast("int").alias("n_emails"),
        n_nums.cast("int").alias("n_numbers"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


def tf_idf_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level term statistics: (doc, token, tf, df, n_docs) — the
    exact integer core of TF-IDF (the float score is one deterministic
    expression away; keeping the output integral keeps the oracle
    engine-exact, since ln() may differ in the last ulp across libms).

    Scale shape: one explode + two grouped aggregations, both keyed on
    the token — the doc-frequency side aggregates the (doc, token)
    pairs, never re-reads the corpus; n_docs broadcasts back as a
    one-row frame."""
    toks = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(id_col, "token", "tf", "df", "n_docs")
    )


def bm25_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
) -> DataFrame:
    """BM25 term-weighting core per (doc, token) — Okapi BM25 with the
    engine-exact treatment (pre-built r10; the registered face lands
    in r11).

    BM25's per-term score is IDF(t) · sat(tf, dl) with the saturation

        sat = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Both factors are RATIONAL once k1, b are rationals and avgdl is
    kept as total_tokens/n_docs (never divided early):

        sat  = (a1+a2)·b2·T·tf / (a2·b2·T·tf + a1·(b2−b1)·T
                                   + a1·b1·dl·N)
        pidf = (2N − 2df + 1) / (2df + 1)     [the probabilistic IDF
                ratio (N−df+0.5)/(df+0.5) — ln of it is classic BM25;
                the ln stays OUT of the face (cross-engine libm)]

    with k1 = a1/a2, b = b1/b2, N = n_docs, T = total corpus tokens,
    dl = doc length. Output: integer cores (tf, dl, df, n_docs,
    total_tokens) plus sat_q6 / pidf_q6 / bm25_core_q6 — exact
    trunc(x·10^6) BIGINTs via DECIMAL(38,0) division (q_div), so any
    engine reproduces them bit-for-bit. bm25_core_q6 multiplies the
    two rationals in ONE exact division (ranking-equivalent to BM25
    with log-free IDF; callers wanting the classic ln(pidf)·sat apply
    it driver-side from the cores).

    Scale shape: tf_idf_stats's explode + two grouped aggs, plus a
    per-doc length agg joined back on the doc key and two one-row
    broadcast totals — everything shuffles on token or doc keys only;
    magnitudes stay < 10^38 in the DECIMAL path even at
    T ~ 10^12, N ~ 10^9, tf ~ 10^4 (documented bound, not a runtime
    probe)."""
    from medallion_delta_lake_spark.operators.agg import q_div

    a1, a2 = k1
    b1, b2 = b
    if a1 <= 0 or a2 <= 0 or b1 < 0 or b2 <= 0 or b1 > b2:
        raise ValueError(f"bad BM25 params k1={k1} b={b}")
    toks = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    totals = toks.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    base = (
        tf.join(dl, id_col)
        .join(dfreq, "token")
        .crossJoin(F.broadcast(totals))
    )
    t_, n_ = F.col("total_tokens"), F.col("n_docs")
    sat_num = (
        F.lit((a1 + a2) * b2).cast("decimal(38,0)")
        * t_.cast("decimal(38,0)")
        * F.col("tf").cast("decimal(38,0)")
    )
    sat_den = (
        F.lit(a2 * b2).cast("decimal(38,0)")
        * t_.cast("decimal(38,0)")
        * F.col("tf").cast("decimal(38,0)")
        + F.lit(a1 * (b2 - b1)).cast("decimal(38,0)")
        * t_.cast("decimal(38,0)")
        + F.lit(a1 * b1).cast("decimal(38,0)")
        * F.col("dl").cast("decimal(38,0)")
        * n_.cast("decimal(38,0)")
    )
    pidf_num = (F.lit(2) * n_ - F.lit(2) * F.col("df") + F.lit(1)).cast(
        "decimal(38,0)"
    )
    pidf_den = (F.lit(2) * F.col("df") + F.lit(1)).cast("decimal(38,0)")
    return base.select(
        id_col,
        "token",
        "tf",
        "dl",
        "df",
        "n_docs",
        "total_tokens",
        q_div(sat_num, sat_den, 6).alias("sat_q6"),
        q_div(pidf_num, pidf_den, 6).alias("pidf_q6"),
        q_div(sat_num * pidf_num, sat_den * pidf_den, 6).alias(
            "bm25_core_q6"
        ),
    )


# Character-trigram profiles (most-frequent trigrams per language, from
# public frequency tables); the n-gram flavor of language ID — robust
# to domains where stopword lists miss (code, titles, short strings).
LANG_TRIGRAMS: dict[str, list[str]] = {
    "en": ["the", "and", "ing", "ion", "tio", " th", "he ", "er ",
           "en ", " of", "nd ", "ed "],
    "de": ["der", "die", "und", "sch", "ein", "ich", "nde", "che",
           " de", "ber", "ten", "ung"],
    "fr": ["les", "ent", "de ", "la ", "ion", "es ", "une", " le",
           "que", "ait", "our", " pa"],
    "es": ["de ", "la ", "que", "el ", "en ", "ión", "los", "ado",
           " de", "es ", "ar ", "ent"],
}


def char_trigrams(col: Column | str) -> Column:
    """Distinct character 3-grams of the normalized text
    (array<string>; empty for texts shorter than 3 chars)."""
    norm = normalize_text(col)
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length(norm) - 2, F.lit(0))
            ),
            lambda i: norm.substr(i, F.lit(3)),
        )
    )


def language_id_ngram(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Language ID by character-trigram profile overlap: score(lang) =
    |doc trigrams ∩ lang profile|, argmax with deterministic priority
    (earlier language wins ties; 'und' when all scores are 0). Same
    codegen-only shape as the stopword variant — zero shuffle."""
    tg = char_trigrams(text_col)
    out = df.select(*[F.col(c) for c in id_cols], tg.alias("_tg"))
    langs = list(LANG_TRIGRAMS)
    for lang in langs:
        profile = F.array(*[F.lit(t) for t in LANG_TRIGRAMS[lang]])
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.array_intersect(F.col("_tg"), profile)),
        )
    detected = F.lit("und")
    for lang in reversed(langs):
        cond = F.col(f"score_{lang}") > 0
        for other in langs:
            if other == lang:
                continue
            op = (
                F.col(f"score_{lang}") > F.col(f"score_{other}")
                if langs.index(other) < langs.index(lang)
                else F.col(f"score_{lang}") >= F.col(f"score_{other}")
            )
            cond = cond & op
        detected = F.when(cond, lang).otherwise(detected)
    return out.select(
        *id_cols,
        *[F.col(f"score_{lang}") for lang in langs],
        detected.alias("detected_lang"),
    )


def token_typicality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram-LM-style typicality score: the mean corpus-wide
    frequency of a document's tokens (multiplicity-weighted). Very
    low scores flag gibberish / OOV-heavy documents, very high scores
    flag stopword soup — the cheap engine-exact cousin of a KenLM
    perplexity filter (which would need a Python model UDF).

    Integer-exact: per-doc ``freq_sum`` and ``n_tokens`` are bigints;
    ``typicality`` is their int/int double division.

    Scale shape: tokens shuffle as 8-byte h64 hashes (posting-list
    discipline); the global count has map-side combine; the per-doc
    rollup is keyed by id. Two bigint-keyed shuffles, no text
    movement after the initial per-row explode."""
    hashed = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    ).select(F.col(id_col), h64("tok").alias("th"))
    counts = hashed.groupBy("th").agg(F.count(F.lit(1)).alias("c"))
    return (
        hashed.join(counts, "th")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("c").alias("freq_sum"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("freq_sum"),
            (
                F.col("freq_sum").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("typicality"),
        )
    )


def ngram_freq(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide n-gram frequency table — the collocation /
    count-based-LM statistic (what a KenLM build or a watermark /
    memorization probe consumes). Documents shorter than ``n`` tokens
    contribute nothing; grams below ``min_count`` are dropped (the
    long tail is almost all of the distinct grams — the filter is what
    keeps the output table small enough to broadcast downstream).

    Scale shape: per-row gram explode (no shuffle), then ONE grouped
    count with map-side combine — the classic word-count plan; the
    shuffle carries (gram, partial count). At 100 TB pre-hashing the
    gram to h64 would shrink shuffle bytes further at the cost of
    losing the literal strings; this keeps the strings because the
    table IS the deliverable."""
    toks_df = df.select(tokenize(text_col).alias("tk")).filter(
        F.size("tk") >= n
    )
    grams = toks_df.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - n),
                lambda i: F.array_join(F.slice("tk", i + 1, n), " "),
            )
        ).alias("ngram")
    )
    return grams.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("freq")
    ).filter(F.col("freq") >= min_count)


def quality_calibrate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Per-stratum quality-cutoff calibration: the exact lower-quartile
    quality score of each source (type-1 quantile — the value at rank
    floor((n-1)/4)+1 under (score, id) order, integer-exact, no
    interpolation) plus how many documents fall strictly below it.
    A mixture pipeline uses these as per-source adaptive thresholds
    instead of one global ``min_quality`` (a threshold tuned on clean
    wiki text would delete most of a noisy crawl source).

    Scale shape: scoring is per-row codegen; the rank and count ride
    one window shuffle keyed by the stratum; the quartile row is a
    filter, and the below-count rejoins the tiny per-stratum frame by
    broadcast — the corpus shuffles once, as (id, stratum, score)."""
    from pyspark.sql import Window as W

    scored = quality_score(df, text_col, (id_col, strata_col)).select(
        id_col, strata_col, "quality_score"
    )
    w = W.partitionBy(strata_col).orderBy("quality_score", id_col)
    ranked = scored.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy(strata_col))
    )
    q = ranked.filter(
        F.col("rn") == F.floor((F.col("n") - 1) / 4) + 1
    ).select(
        F.col(strata_col),
        F.col("n").alias("n_docs"),
        F.col("quality_score").alias("q25"),
    )
    return (
        scored.join(F.broadcast(q), strata_col)
        .groupBy(strata_col, "n_docs", "q25")
        .agg(
            F.sum(
                F.when(F.col("quality_score") < F.col("q25"), 1).otherwise(0)
            ).cast("bigint").alias("n_below")
        )
    )


def canonicalize_url(url: Column | str) -> Column:
    """URL canonicalization for URL-keyed dedup: case-fold the scheme
    and host (case-insensitive per RFC 3986 — the PATH stays
    case-sensitive), drop a ``www.`` prefix, strip query string /
    fragment, and trim trailing slashes. Crawl pipelines dedup on this
    key before any content hash — the same page arrives as http/https,
    with and without www, and with tracking params. Pure codegen
    regexp chain, zero shuffle; every regex is RE2-safe so the DuckDB
    oracle evaluates the identical patterns."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(u, r"^[Hh][Tt][Tt][Pp][Ss]?://([^/]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_replace(u, r"^[Hh][Tt][Tt][Pp][Ss]?://[^/]+", "")
    rest = F.regexp_replace(rest, r"[#?].*$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(host, rest)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (identical values; the
    'g' flag matches Spark's replace-all semantics)."""
    host = (
        f"regexp_replace(lower(regexp_extract({expr},"
        f" '^[Hh][Tt][Tt][Pp][Ss]?://([^/]+)', 1)), '^www\\.', '', 'g')"
    )
    rest = (
        f"regexp_replace(regexp_replace(regexp_replace({expr},"
        f" '^[Hh][Tt][Tt][Pp][Ss]?://[^/]+', '', 'g'),"
        f" '[#?].*$', '', 'g'), '/+$', '', 'g')"
    )
    return f"({host} || {rest})"


_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: '&amp;lt;' must not double-decode
]


def strip_html(
    df: DataFrame, text_col: str = "html", out_col: str = "text_clean"
) -> DataFrame:
    """HTML → text for crawled corpora: drop <script>/<style> elements
    WITH their contents, remove every remaining tag, decode the five
    predefined XML entities (amp last so ``&amp;lt;`` decodes to
    ``&lt;``, not ``<``), and collapse whitespace runs. Adds
    ``out_col`` plus ``n_tags`` (tags removed — a markup-density
    quality signal). The regexes are shared verbatim with the DuckDB
    oracle (RE2-compatible: non-greedy ``.*?``, no backrefs); pure
    codegen, zero shuffle — the shape of the WET-extraction pass over
    a crawl at 100 TB."""
    raw = F.col(text_col)
    n_tags = (
        F.size(F.split(raw, r"<[^>]+>")) - 1
    ).cast("int")
    s = F.regexp_replace(raw, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return df.withColumn(out_col, s).withColumn("n_tags", n_tags)


def vocab_overlap(
    df: DataFrame,
    text_col: str = "text",
    strata_col: str = "source",
) -> DataFrame:
    """Pairwise vocabulary overlap between corpus strata: per ordered
    stratum pair, the distinct-token intersection size, both vocabulary
    sizes, and the Jaccard similarity — the corpus-comparison
    diagnostic run before mixing sources (near-identical vocabularies
    signal near-duplicate feeds; disjoint ones, domain shift). All
    counts integral, one closing IEEE division per pair.

    Plan: explode → (stratum, token) distinct (shuffle carries tokens
    once, map-side combined), a token-keyed self-join for
    intersections — Σ postings², bounded by shared-vocabulary size,
    never |corpus|² — and a broadcast of the |strata| vocab sizes."""
    from medallion_delta_lake_spark.functions.texts import tokenize

    tok = (
        df.select(
            F.col(strata_col).alias("_s"),
            F.explode(tokenize(F.col(text_col))).alias("_t"),
        )
        .filter(F.col("_t") != "")
        .distinct()
    )
    sizes = tok.groupBy("_s").agg(F.count(F.lit(1)).alias("_n"))
    a = tok.select(F.col("_s").alias("src_a"), "_t")
    b = tok.select(F.col("_s").alias("src_b"), "_t")
    inter = (
        a.join(b, "_t")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("_s").alias("src_a"),
                                     F.col("_n").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("_s").alias("src_b"),
                                     F.col("_n").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


def zipf_profile(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Zipf rank–frequency profile of the corpus head: the ``top_k``
    tokens with rank, frequency, and the rank·frequency product —
    which Zipf's law predicts is roughly constant, so its deviation
    from the rank-1 value is the corpus-health signal (a spiking
    product at low ranks flags boilerplate flooding; a collapsing one
    flags vocabulary truncation). Everything emitted is INTEGER —
    rank·freq products instead of a fitted log-log slope, because
    ln() is not bit-identical across engines (libm ulp drift) while
    integer products are. One explode + one grouped count (map-side
    combined) + one tiny top-k sort; the token long tail never
    leaves the aggregate."""
    from pyspark.sql import Window as W

    freq = (
        df.select(F.explode(tokenize(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # top-k FIRST via orderBy().limit() (TakeOrderedAndProject — a
    # distributed local-top-k, never a vocab-cardinality sort in one
    # partition); the rank window then runs over ≤top_k rows
    top = freq.orderBy(
        F.col("freq").desc(), F.col("token").asc()
    ).limit(top_k)
    w = W.orderBy(F.col("freq").desc(), F.col("token").asc())
    ranked = top.select(
        "token", "freq", F.row_number().over(w).alias("rank")
    )
    head = ranked.filter(F.col("rank") == 1).select(
        F.col("freq").alias("_head_freq")
    )
    return (
        ranked.crossJoin(F.broadcast(head))
        .select(
            "rank",
            "token",
            "freq",
            (F.col("rank") * F.col("freq")).alias("rank_freq"),
            (F.col("rank") * F.col("freq") - F.col("_head_freq")).alias(
                "dev_from_head"
            ),
        )
    )
