"""BM25 term-weighting core (text_analysis.bm25_stats, pre-built
r10): exact-rational ground truth via fractions.Fraction, the DuckDB
mirror, and parameter validation."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest

from medallion_delta_lake_spark.operators import text_analysis as ta

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog sat"),
    ("d3", "cat cat cat"),
]


def _truth():
    """Exact rational BM25 cores for DOCS with k1=6/5, b=3/4."""
    a1, a2, b1, b2 = 6, 5, 3, 4
    toks = {d: t.split() for d, t in DOCS}
    tf = {
        (d, w): toks[d].count(w) for d in toks for w in set(toks[d])
    }
    df = {}
    for d, w in tf:
        df[w] = df.get(w, 0) + 1
    n = len(DOCS)
    t = sum(len(v) for v in toks.values())
    out = {}
    for (d, w), f in tf.items():
        dl = len(toks[d])
        sat = Fraction((a1 + a2) * b2 * t * f,
                       a2 * b2 * t * f + a1 * (b2 - b1) * t
                       + a1 * b1 * dl * n)
        pidf = Fraction(2 * n - 2 * df[w] + 1, 2 * df[w] + 1)
        out[(d, w)] = (
            int(sat * 10**6),
            int(pidf * 10**6),
            int(sat * pidf * 10**6),
        )
    return out


def test_bm25_matches_exact_rationals(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = {
        (r["doc_id"], r["token"]): (
            r["sat_q6"], r["pidf_q6"], r["bm25_core_q6"]
        )
        for r in ta.bm25_stats(df).collect()
    }
    assert got == _truth()


def test_bm25_rarity_and_saturation_orderings(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    rows = {
        (r["doc_id"], r["token"]): r
        for r in ta.bm25_stats(df).collect()
    }
    # 'dog' (df=1) must out-idf 'cat' (df=2); equal df ⇒ equal pidf
    assert (
        rows[("d2", "dog")]["pidf_q6"] > rows[("d3", "cat")]["pidf_q6"]
    )
    assert (
        rows[("d3", "cat")]["pidf_q6"] == rows[("d2", "the")]["pidf_q6"]
    )
    # saturation: tf=3 scores less than 3× the tf=1 saturation
    one = rows[("d1", "cat")]["sat_q6"]
    three = rows[("d3", "cat")]["sat_q6"]
    assert one < three < 3 * one


def test_bm25_duckdb_mirror(spark):
    """The full integer face reproduces bit-for-bit in DuckDB — the
    r11 oracle is safe by construction."""
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got_spark = {
        tuple(r)
        for r in ta.bm25_stats(df)
        .select("doc_id", "token", "sat_q6", "pidf_q6", "bm25_core_q6")
        .collect()
    }
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    got_duck = {
        tuple(r)
        for r in con.sql(
            f"""
            WITH d AS (
              SELECT doc_id, string_split({norm}, ' ') AS toks
              FROM docs
            ),
            toks AS (SELECT doc_id, unnest(toks) AS token FROM d),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf
                   FROM toks GROUP BY doc_id, token),
            dl AS (SELECT doc_id, COUNT(*) AS dl
                   FROM toks GROUP BY doc_id),
            dfreq AS (SELECT token, COUNT(*) AS df
                      FROM tf GROUP BY token),
            tot AS (SELECT COUNT(*) AS t,
                           COUNT(DISTINCT doc_id) AS n FROM toks)
            SELECT f.doc_id, f.token,
              CAST((CAST(44 AS HUGEINT) * t * tf * 1000000)
                   // (CAST(20 AS HUGEINT) * t * tf + 6 * t
                       + 18 * l.dl * n) AS BIGINT) AS sat_q6,
              CAST((CAST(2 * n - 2 * df + 1 AS HUGEINT) * 1000000)
                   // (2 * df + 1) AS BIGINT) AS pidf_q6,
              CAST((CAST(44 AS HUGEINT) * t * tf
                    * (2 * n - 2 * df + 1) * 1000000)
                   // ((CAST(20 AS HUGEINT) * t * tf + 6 * t
                        + 18 * l.dl * n) * (2 * df + 1))
                   AS BIGINT) AS bm25_core_q6
            FROM tf f
            JOIN dl l ON l.doc_id = f.doc_id
            JOIN dfreq ON dfreq.token = f.token, tot
            """
        ).fetchall()
    }
    assert got_spark == got_duck


def test_bm25_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    with pytest.raises(ValueError):
        ta.bm25_stats(df, k1=(0, 1))
    with pytest.raises(ValueError):
        ta.bm25_stats(df, b=(5, 4))  # b > 1
