"""Property test for the cross-engine hash foundation: h64 and the
rolling fingerprint must agree bit-for-bit between Spark and DuckDB on
arbitrary strings — every dedup oracle rests on this."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions import hashing

# printable unicode without surrogates; includes whitespace and quotes
TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), min_codepoint=1, max_codepoint=0x2FFF
    ),
    max_size=40,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strings=st.lists(TEXT, min_size=1, max_size=8, unique=True))
def test_h64_parity(spark, strings):
    sdf = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {
        r.s: r.h
        for r in sdf.select("s", hashing.h64("s").alias("h")).collect()
    }
    con = duckdb.connect()
    for s in strings:
        (expected,) = con.execute(
            f"SELECT {hashing.h64_sql('?')}", [s]
        ).fetchone()
        assert got[s] == expected, repr(s)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tokens=st.lists(st.text(alphabet="abcxyz09", min_size=1, max_size=6),
                       min_size=0, max_size=10))
def test_rolling_fingerprint_parity(spark, tokens):
    sdf = spark.createDataFrame([(tokens,)], "toks array<string>")
    (got,) = sdf.select(
        hashing.rolling_fingerprint(F.col("toks")).alias("fp")
    ).first()
    con = duckdb.connect()
    (expected,) = con.execute(
        f"SELECT {hashing.rolling_fingerprint_sql('?::VARCHAR[]')}", [tokens]
    ).fetchone()
    assert got == expected, tokens
