"""Oracle-parity + semantic tests for the round-9 model-evaluation
surface (plans/queries_mleval.py, operators/mleval.py), run at
sf0.001."""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans import queries_mleval  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

MLEVAL_IDS = [
    "ml-roc-auc",
    "ml-lift-deciles",
    "ml-pr-at-k",
    "ml-brier-score",
    "ml-confusion-threshold",
    "ml-ndcg-at-k",
    "ts-holt-linear",
    "agg-bootstrap-poisson-ci",
    "ml-group-auc",
    "ml-ks-separation",
    "stats-permutation-test",
    "stats-cohens-kappa",
    "ml-expected-calibration-error",
]


@pytest.mark.parametrize("name", MLEVAL_IDS)
def test_mleval_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


def _mini(spark, rows):
    """(event_id, user_id, value, label) frame for the operator API."""
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, value double, label int"
    )


def test_roc_auc_known_value(spark):
    """pos scores {3.0, 1.0} vs neg {2.0, 1.0}: pairs = win, win,
    loss, tie -> AUC = 2.5/4 = 0.625; gini = 0.25."""
    from medallion_delta_lake_spark.operators.mleval import roc_auc

    df = _mini(
        spark,
        [(1, 1, 3.0, 1), (2, 1, 1.0, 1), (3, 1, 2.0, 0), (4, 1, 1.0, 0)],
    )
    row = roc_auc(df, "value", "label").collect()[0]
    assert row.n_pos == 2 and row.n_neg == 2
    assert row.auc == pytest.approx(0.625, abs=1e-12)
    assert row.gini == pytest.approx(0.25, abs=1e-12)


def test_roc_auc_perfect_separation(spark):
    from medallion_delta_lake_spark.operators.mleval import roc_auc

    df = _mini(
        spark,
        [(i, 1, 10.0 + i, 1) for i in range(5)]
        + [(10 + i, 1, 1.0 + i, 0) for i in range(5)],
    )
    assert roc_auc(df, "value", "label").collect()[0].auc == 1.0


def test_ndcg_perfect_ranking_is_one(spark):
    """When every positive outranks every negative, DCG == IDCG."""
    from medallion_delta_lake_spark.operators.mleval import ndcg_at_k

    df = _mini(
        spark,
        [(i, 7, 100.0 - i, 1) for i in range(3)]
        + [(10 + i, 7, 10.0 - i, 0) for i in range(3)],
    )
    row = ndcg_at_k(df, "value", "label", "user_id").collect()[0]
    assert row.ndcg == 1.0 and row.dcg_i == row.idcg_i


def test_lift_deciles_invariants(spark):
    """Decile sizes sum to N; final cumulative capture is exactly 1;
    size spread <= 1 row (arithmetic cut)."""
    from medallion_delta_lake_spark.operators.mleval import lift_deciles

    rows = [
        (i, 1, float(i % 37) + 0.25, 1 if i % 3 == 0 else 0)
        for i in range(97)
    ]
    out = lift_deciles(_mini(spark, rows), "value", "label").collect()
    assert sum(r.n for r in out) == 97
    assert max(r.n for r in out) - min(r.n for r in out) <= 1
    last = max(out, key=lambda r: r.decile)
    assert last.cum_capture == 1.0


def test_holt_linear_hand_recursion(spark):
    """3-step series x = [4, 8, 2], alpha = beta = 1/2:
    l1 = 0.5*8 + 0.5*4 = 6, b1 = 0.5*2 + 0 = 1;
    l2 = 0.5*2 + 0.5*7 = 4.5, b2 = 0.5*(-1.5) + 0.5*1 = -0.25."""
    from medallion_delta_lake_spark.operators.pandas_ops import holt_linear

    df = spark.createDataFrame(
        [(1, 1, 4.0), (1, 2, 8.0), (1, 3, 2.0)],
        "user_id bigint, step bigint, x double",
    )
    out = {
        r.step: r
        for r in holt_linear(df, "user_id", "step", "x").collect()
    }
    assert out[1].level == 4.0 and out[1].trend == 0.0
    assert out[2].level == 6.0 and out[2].trend == 1.0
    assert out[3].level == 4.5 and out[3].trend == -0.25


def test_poisson_bootstrap_ci_brackets_mean(spark):
    """CI must bracket the point mean; replicate count is as asked."""
    from medallion_delta_lake_spark.operators.mleval import (
        poisson_bootstrap_mean_ci,
    )

    df = spark.createDataFrame(
        [(i, float((i * 7) % 50) + 0.5) for i in range(400)],
        "event_id bigint, value double",
    )
    row = poisson_bootstrap_mean_ci(
        df, "value", "event_id", b=100
    ).collect()[0]
    assert row.n == 400 and row.n_replicates == 100
    assert row.ci_lo <= row.point_mean <= row.ci_hi
    # a 95% CI of a 400-row mean should be tight around the truth
    assert (row.ci_hi - row.ci_lo) < 10.0


def test_ndcg_discount_table_is_frozen():
    """The baked discount integers must never drift (they are embedded
    in both engines' plans — a change would silently break parity with
    any stored artifact)."""
    from medallion_delta_lake_spark.operators.mleval import NDCG_DISC

    assert NDCG_DISC[0] == 1_000_000_000_000
    assert NDCG_DISC == [
        int(1e12 / math.log2(r + 1)) for r in range(1, 11)
    ]


def test_confusion_threshold_cells_partition(spark):
    """TP+FP+FN+TN == N at every threshold."""
    from medallion_delta_lake_spark.operators.mleval import (
        confusion_at_thresholds,
    )

    rows = [
        (i, 1, float(i % 23) + 0.5, 1 if i % 4 == 0 else 0)
        for i in range(61)
    ]
    out = confusion_at_thresholds(
        _mini(spark, rows), "value", "label"
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r.tp + r.fp + r.fn + r.tn == 61


def test_grouped_auc_matches_global_on_single_group(spark):
    """One segment == the global op (same midrank machinery)."""
    from medallion_delta_lake_spark.operators.mleval import (
        grouped_roc_auc,
        roc_auc,
    )

    rows = [
        (i, 1, float((i * 13) % 40) + 0.25, 1 if i % 3 == 0 else 0)
        for i in range(120)
    ]
    df = _mini(spark, rows).withColumn("seg", F.lit(1))
    g = grouped_roc_auc(df, "value", "label", "seg").collect()[0]
    a = roc_auc(df, "value", "label").collect()[0]
    assert g.auc == a.auc and g.n_pos == a.n_pos


def test_ks_separation_perfect_split(spark):
    """Disjoint score supports -> KS = 1 at the positive minimum
    boundary."""
    from medallion_delta_lake_spark.operators.mleval import ks_separation

    df = _mini(
        spark,
        [(i, 1, 1.0 + i, 0) for i in range(5)]
        + [(10 + i, 1, 100.0 + i, 1) for i in range(5)],
    )
    row = ks_separation(df, "value", "label").collect()[0]
    assert row.ks_stat == 1.0
    assert row.at_score_cents == 500  # all negatives <= 5.00
