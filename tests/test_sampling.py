"""Deterministic hash sampling: reproducibility, rate accuracy, salt
independence — the properties RNG-based sample() cannot give."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import sampling


def _ids(df):
    return {r.id for r in df.collect()}


def test_sample_hash_rate_and_determinism(spark):
    df = spark.range(20_000).select(F.col("id"))
    s1 = _ids(sampling.sample_hash(df, "id", 0.3, salt="a"))
    s2 = _ids(sampling.sample_hash(df, "id", 0.3, salt="a"))
    assert s1 == s2  # same salt -> identical set, any run/partitioning
    assert abs(len(s1) / 20_000 - 0.3) < 0.02  # hash uniformity

    s3 = _ids(sampling.sample_hash(df.repartition(13), "id", 0.3, salt="a"))
    assert s3 == s1  # layout-independent

    sb = _ids(sampling.sample_hash(df, "id", 0.3, salt="b"))
    assert sb != s1  # new salt -> independent draw
    overlap = len(s1 & sb) / 20_000
    assert abs(overlap - 0.09) < 0.02  # ~rate^2 if independent


def test_sample_stratified_rates_per_stratum(spark):
    df = spark.range(30_000).select(
        F.col("id"), (F.pmod(F.col("id"), F.lit(3))).cast("string").alias("g")
    )
    out = sampling.sample_stratified_hash(
        df, "id", "g", rates={"0": 1.0, "1": 0.2}, default_rate=0.0
    )
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts.get("0") == 10_000          # rate 1.0 keeps everything
    assert abs(counts.get("1", 0) - 2_000) < 200
    assert "2" not in counts                  # default 0.0 drops stratum


def test_observed_audit_rides_the_action(spark):
    # metrics are a side effect of the caller's single action: no
    # second scan, exact counts
    from medallion_delta_lake_spark.operators.observe import observed_audit

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    audited, obs = observed_audit(df, "probe", null_cols=["v"])
    out = audited.filter(F.col("id") < 500).count()  # ONE action
    assert out == 500
    got = obs.get
    # observation sees the pre-filter frame it was attached to
    assert got["n_rows"] == 1000
    assert got["n_null_v"] == 100
