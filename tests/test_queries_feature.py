"""Oracle-parity + semantic tests for the round-9 feature surface
(plans/queries_feature.py), run at sf0.001."""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans import queries_feature  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

FEATURE_IDS = [
    "feature-point-in-time",
    "window-mann-kendall",
    "stats-cramers-v",
    "events-rfm-scores",
    "stats-grubbs-test",
    "sample-weighted-reservoir",
    "window-cusum-mean-shift",
    "agg-l-moments",
    "normalize-quantile-map",
    "ml-calibration-bins",
    "scan-python-datasource",
    "events-conversion-lag",
    "stats-anova-oneway",
    "agg-seasonal-index",
    "window-rolling-median",
    "events-dau-wau-mau",
    "affinity-basket-pairs",
    "events-seasonal-anomaly",
    "window-rsi",
    "agg-hdr-percentiles",
    "stats-friedman-test",
    "agg-tukey-fences",
    "join-nn-match-1d",
    "stats-matched-uplift",
    "stats-durbin-watson",
    "events-new-vs-returning",
    "window-donchian-channel",
    "stats-sign-test",
    "stats-two-proportion-z",
    "stats-cuped-theta",
    "stats-srm-check",
    "dedup-rate-by-source",
    "stats-ols-slope-group",
    "agg-xyz-classification",
]


@pytest.mark.parametrize("name", FEATURE_IDS)
def test_feature_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


def test_point_in_time_join_semantics(spark):
    """Tiny hand-built SCD-2 dimension: facts before the first
    interval are unmatched; facts inside a closed interval get the
    then-valid feature; facts past the tolerance are stale-masked."""
    from medallion_delta_lake_spark.operators.joins import (
        point_in_time_join,
    )

    d = dt.date
    dim = spark.createDataFrame(
        [
            (1, d(2020, 1, 1), d(2020, 6, 1), "bronze"),
            (1, d(2020, 6, 1), None, "gold"),
        ],
        "k int, valid_from date, valid_to date, tier string",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, d(2019, 12, 1)),  # before history -> unmatched
            (101, 1, d(2020, 3, 1)),   # inside closed interval
            (102, 1, d(2020, 6, 1)),   # boundary: new interval opens
            (103, 1, d(2021, 9, 1)),   # > 365 days stale
            (104, 2, d(2020, 3, 1)),   # unknown entity -> unmatched
        ],
        "fid int, k int, ts date",
    )
    out = {
        r.fid: r
        for r in point_in_time_join(
            facts,
            dim,
            key="k",
            ts_col="ts",
            feature_cols=["tier"],
            tolerance_days=365,
        ).collect()
    }
    assert not out[100].matched and out[100].tier is None
    assert out[101].matched and out[101].tier == "bronze"
    assert out[101].days_since_update == 60 and out[101].is_stale is False
    assert out[102].tier == "gold" and out[102].days_since_update == 0
    assert out[103].matched and out[103].is_stale and out[103].tier is None
    assert out[103].days_since_update == 457
    assert not out[104].matched and out[104].is_stale is None


def test_weighted_reservoir_is_weighted_and_deterministic(spark):
    """Higher-weight rows must be over-represented, and two runs must
    pick the identical row set."""
    q = QUERIES["sample-weighted-reservoir"]
    a = {(r.event_type, r.event_id) for r in q(spark, SF_SMOKE).collect()}
    b = {(r.event_type, r.event_id) for r in q(spark, SF_SMOKE).collect()}
    assert a == b and len(a) > 0
    # selection is weight-biased: kept rows' mean value exceeds the
    # population mean (value is the weight)
    from medallion_delta_lake_spark.plans.registry import table

    ev = table(spark, SF_SMOKE, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    pop_mean = ev.agg(F.avg("value")).first()[0]
    kept_mean = q(spark, SF_SMOKE).agg(F.avg("value")).first()[0]
    assert kept_mean > pop_mean


def test_cusum_matches_recursive_definition(spark):
    """The running-minimum identity must equal the textbook recursion
    S_i = max(0, S_{i-1} + dev_i) computed row-by-row in Python."""
    rows = (
        QUERIES["window-cusum-mean-shift"](spark, SF_SMOKE)
        .orderBy("user_id", "event_id")
        .collect()
    )
    from medallion_delta_lake_spark.plans.registry import table

    ev = (
        table(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    got = {r.event_id: r.s_cusum for r in rows}
    s, prev_user = 0.0, None
    for r in ev:
        if r.user_id != prev_user:
            s, prev_user = 0.0, r.user_id
        s = max(0.0, s + (r.value - 100.0))
        assert abs(got[r.event_id] - s) < 1e-6, (r.event_id, got[r.event_id], s)
