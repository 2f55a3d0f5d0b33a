"""Regression tests for the round-2 ADVICE findings.

1. compact() crash recovery: a crash between the two renames must be
   repaired on the next compact (and a stale __staging/__old cleared).
2. token_count_pudf whitespace parity: the pandas path must agree with
   the native (Java-regex, ASCII ``\\s``) tokenizer on non-ASCII
   whitespace such as NBSP.
3. Operator-internal caches are tracked and released by the corpus
   pipeline — no cached blocks outlive a clean_corpus() run.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators.caching import release_caches
from medallion_delta_lake_spark.operators.pandas_ops import with_token_count
from medallion_delta_lake_spark.functions.texts import tokenize
from medallion_delta_lake_spark.pipelines import corpus
from medallion_delta_lake_spark.plans.queries_text import _dup_corpus
from medallion_delta_lake_spark.sources import writers
from tests.conftest import SF_SMOKE

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


def test_compact_recovers_mid_swap_crash(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    df.repartition(8).write.parquet(path)
    # simulate a crash between os.rename(path, old) and
    # os.rename(staging, path): the live snapshot is parked at __old
    os.rename(path, path + "__old")
    os.makedirs(path + "__staging/junk", exist_ok=True)
    assert not os.path.exists(path)
    writers.compact(spark, path, target_files=2, sort_cols=["id"])
    got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(i, 2 * i) for i in range(100)}
    assert not os.path.exists(path + "__staging")
    assert not os.path.exists(path + "__old")


def test_token_count_pudf_non_ascii_whitespace_parity(spark):
    # NBSP is Unicode whitespace but NOT Java-regex \s: the native
    # tokenizer keeps "a<NBSP>b" as one token; the pandas path must
    # agree (it once split on it via Python's Unicode-aware \s+)
    nbsp = "a\u00a0b c"
    texts = [nbsp, "x y", "  plain  text here  ", "one"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = with_token_count(df, "text", "pandas_n").withColumn(
        "native", F.size(tokenize("text"))
    )
    rows = {r.text: (r.native, r.pandas_n) for r in out.collect()}
    for text, (native, pandas_n) in rows.items():
        assert native == pandas_n, (text, native, pandas_n)
    assert rows[nbsp] == (2, 2)  # NBSP binds, plain space splits


def test_corpus_pipeline_releases_tracked_caches(spark):
    spark.catalog.clearCache()
    docs = _dup_corpus(spark, SF_SMOKE)
    cleaned, stats = corpus.clean_corpus(
        spark, docs, min_quality=25, neardup_threshold=0.5
    )
    assert stats.first().n_final > 0
    leftover = release_caches()  # pipeline already released its own
    assert leftover == 0
    # round 5: the returned frame STAYS cached (the caller's action must
    # not recompute the LSH stage); it is the only surviving cache, and
    # releasing it is the caller's job
    assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    cleaned.unpersist(blocking=True)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
