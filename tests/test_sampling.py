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


def test_shuffle_shards_permutation_properties(spark):
    df = spark.range(8_000).select(F.col("id"))
    out = sampling.shuffle_shards(df, "id", n_shards=8).cache()
    rows = out.collect()
    assert len(rows) == 8_000  # a permutation: no rows added/dropped

    # hash-balanced shards (within 15% of even)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert abs(len(positions) / 1_000 - 1.0) < 0.15
        # shard_pos is a dense 1..n ranking within the shard
        assert sorted(positions) == list(range(1, len(positions) + 1))

    # deterministic: same salt -> identical assignment on any layout
    again = sampling.shuffle_shards(df.repartition(7), "id", n_shards=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))

    # a new salt draws a different epoch order
    other = sampling.shuffle_shards(df, "id", n_shards=8, salt="epoch1")
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other.collect()))
    out.unpersist()


def test_assign_split_stability_and_fractions(spark):
    df = spark.range(20_000).select(F.col("id"))
    out = sampling.assign_split(
        df, "id", {"train": 0.9, "val": 0.05, "test": 0.05}
    ).cache()
    counts = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}  # fractions sum to 1
    assert abs(counts["train"] / 20_000 - 0.9) < 0.02
    assert abs(counts["val"] / 20_000 - 0.05) < 0.01
    assert abs(counts["test"] / 20_000 - 0.05) < 0.01

    # stability under corpus growth: a doc's split never changes when
    # new docs arrive (the anti-leakage property)
    grown = sampling.assign_split(
        spark.range(40_000).select(F.col("id")),
        "id",
        {"train": 0.9, "val": 0.05, "test": 0.05},
    )
    old = {r.id: r.split for r in out.collect()}
    new = {r.id: r.split for r in grown.filter(F.col("id") < 20_000).collect()}
    assert old == new
    out.unpersist()


def test_split_leakage_audit_detects_cross_split_neardups(spark):
    """A near-dup pair split across train/test must be reported; pairs
    within one split must not."""
    from medallion_delta_lake_spark.operators import dedup

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            (1, base, "train"),
            (2, base + " tail", "test"),     # near-dup, crosses splits
            (3, base + " tail2", "train"),   # near-dup of 1, same split
            (4, "totally different words entirely unrelated content "
                "about nothing similar at all to the others", "test"),
        ],
        "doc_id long, text string, split string",
    )
    out = dedup.split_leakage_pairs(docs, threshold=0.5)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in pairs          # cross-split near-dup flagged
    assert (1, 3) not in pairs      # same-split near-dup is not leakage
    assert all(4 not in p for p in pairs)
