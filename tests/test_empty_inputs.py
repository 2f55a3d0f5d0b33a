"""Empty-input robustness: every operator family must degrade to an
empty (or identity) result, not throw, when a feed is empty — the
first thing that happens in production when an upstream source has a
quiet day."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import (
    clean,
    dedup,
    joins,
    similarity,
    text_analysis as ta,
    upsert,
    window,
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, value double"
    )


def test_text_ops_on_empty(spark, empty_docs):
    assert ta.token_stats(empty_docs).count() == 0
    assert ta.quality_score(empty_docs).count() == 0
    assert ta.language_id(empty_docs).count() == 0
    assert ta.fingerprint(empty_docs).count() == 0


def test_dedup_ops_on_empty(spark, empty_docs):
    assert dedup.exact_dedup_groups(empty_docs).count() == 0
    assert dedup.shingle_hashes(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0
    assert dedup.minhash_signatures(empty_docs).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0
    assert dedup.simhash(empty_docs).count() == 0
    assert dedup.simhash_pairs(empty_docs).count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long, jaccard double")
    assert dedup.neardup_clusters(
        empty_docs.select("doc_id"), pairs
    ).count() == 0


def test_similarity_ops_on_empty(spark):
    empty_vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert similarity.brute_force_topk(empty_vecs, empty_vecs).count() == 0
    assert similarity.neardup_pairs(empty_vecs, n_planes=6).count() == 0
    one = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    # empty corpus with non-empty queries → no neighbors, no throw
    assert similarity.brute_force_topk(one, empty_vecs).count() == 0


def test_window_and_clean_ops_on_empty(spark, empty_events):
    assert window.latest_per_key(empty_events, ["user_id"], "ts").count() == 0
    assert window.sessionize(empty_events, ["user_id"], "ts").count() == 0
    assert window.running_sum(
        empty_events, ["user_id"], ["ts"], "value"
    ).count() == 0
    assert clean.dedup_full_row(empty_events).count() == 0
    assert clean.null_profile(empty_events).count() == 1  # one stats row


def test_joins_on_empty(spark, empty_events):
    right = spark.createDataFrame(
        [(1, 5, "x")], "user_id long, rt long, payload string"
    ).select("user_id", F.col("rt").cast("timestamp").alias("rt"), "payload")
    out = joins.asof_join(
        empty_events.select("event_id", "user_id", "ts"),
        right,
        keys=["user_id"],
        left_ts="ts",
        right_ts="rt",
        payload_cols=["payload"],
    )
    assert out.count() == 0
    labeled = spark.createDataFrame(
        [(59.4, 24.7, 1)], "latitude double, longitude double, county_id int"
    )
    unlabeled = spark.createDataFrame([], "latitude double, longitude double")
    assert joins.nn_assign_spatial(
        unlabeled, labeled, label_cols=["county_id"],
        id_cols=["latitude", "longitude"],
    ).count() == 0


def test_upsert_empty_source(spark, tmp_path):
    """An empty source with delete_missing=False must leave the table
    untouched; with delete_missing=True it empties it (the source IS
    the snapshot)."""
    path = str(tmp_path / "t")
    full = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    empty = spark.createDataFrame([], "k long, v string")
    upsert.upsert(spark, full, path, keys=["k"])
    upsert.upsert(spark, empty, path, keys=["k"], delete_missing=False)
    from medallion_delta_lake_spark.sources import readers

    assert readers.scan_table(spark, path).count() == 2
    upsert.upsert(spark, empty, path, keys=["k"], delete_missing=True)
    assert readers.scan_table(spark, path).count() == 0


def test_round3_operators_on_empty_inputs(spark):
    """Round-3 operators must be total on empty frames (the incremental
    run where a batch has no rows)."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators import (
        joins,
        multimodal as mm,
        sampling,
        similarity as sim,
        skew,
        text_analysis as ta,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_kv = spark.createDataFrame([], "k int, ts int, v int")
    empty_right = spark.createDataFrame([], "k int, rts int, p int")

    assert ta.scrub_pii(empty_docs).count() == 0
    assert ta.tf_idf_stats(empty_docs).count() == 0
    assert ta.language_id_ngram(empty_docs).count() == 0
    assert sampling.sample_hash(empty_docs, "doc_id", 0.5).count() == 0
    assert (
        sampling.sample_stratified_hash(
            empty_docs, "doc_id", "text", {"x": 1.0}
        ).count()
        == 0
    )
    for th in (99, 0):
        assert (
            joins.asof_join(
                empty_kv, empty_right, keys=["k"], left_ts="ts",
                right_ts="rts", payload_cols=["p"], wide_threshold=th,
            ).count()
            == 0
        )
    assert skew.salted_join(empty_kv, empty_right, ["k"]).count() == 0
    payloads = mm.attach_binary_payload(empty_docs)
    assert mm.sample_frames(payloads).count() == 0
    assert mm.chunk_payload(payloads).count() == 0
    assert mm.resize_image(payloads).count() == 0
    # empty corpus: kmeans yields no centroids but must not raise
    empty_vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert sim.kmeans_centroids(empty_vecs, k=4, max_iter=1).count() == 0


def test_round8_ops_on_empty_inputs(spark):
    """Round-8 operators degrade to empty/NULL results, never raise."""
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.operators import agg as agg_ops
    from medallion_delta_lake_spark.operators import dedup
    from medallion_delta_lake_spark.operators import multimodal as mm
    from medallion_delta_lake_spark.operators.graph import degree_histogram
    from medallion_delta_lake_spark.operators.joins import bloom_semi_join
    from medallion_delta_lake_spark.operators.text_analysis import (
        zipf_profile,
    )
    from medallion_delta_lake_spark.operators.upsert import scd2_apply
    from medallion_delta_lake_spark.operators.window import (
        regime_segments,
        rolling_slope,
    )

    empty_ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, value double"
    )
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    empty_kv = spark.createDataFrame([], "k int, v int")

    assert (
        empty_ev.select(
            rolling_slope(
                empty_ev, ["user_id"], ["ts", "event_id"], "value"
            ).alias("s")
        ).count()
        == 0
    )
    assert (
        regime_segments(
            empty_ev, ["user_id"], ["ts", "event_id"],
            F.col("value") >= 0, "ts",
        ).count()
        == 0
    )
    assert (
        agg_ops.count_min_estimate(empty_ev, "user_id", empty_ev).count()
        == 0
    )
    assert (
        agg_ops.mad_outliers(
            empty_ev, ["user_id"], "value", "event_id"
        ).count()
        == 0
    )
    r = agg_ops.kendall_tau(
        empty_ev, "event_id", "value", "user_id"
    ).first()
    assert r["tau_b"] is None
    assert zipf_profile(empty_docs).count() == 0
    assert degree_histogram(empty_pairs, "id_a", "id_b").count() == 0
    # star CC over no edges: every id is its own cluster
    ids = spark.range(3).selectExpr("id AS doc_id")
    got = {
        (r.doc_id, r.cluster)
        for r in dedup.neardup_clusters_star(ids, empty_pairs).collect()
    }
    assert got == {(0, 0), (1, 1), (2, 2)}
    # bloom semi join: empty build side filters everything
    probe = spark.createDataFrame([(1, 1)], "k int, v int")
    assert bloom_semi_join(probe, empty_kv, key="k").count() == 0
    assert bloom_semi_join(empty_kv, probe, key="k").count() == 0
    # scene cuts on empty payloads
    assert (
        mm.scene_cuts(mm.attach_binary_payload(empty_docs)).count() == 0
    )
    # scd2 apply with an empty batch is the identity
    dim = spark.createDataFrame(
        [(1, "2024-01-01", None, "a", True)],
        "k int, valid_from string, valid_to string, attr string, "
        "is_current boolean",
    )
    batch = spark.createDataFrame([], "k int, valid_from string, attr string")
    assert {tuple(r) for r in scd2_apply(dim, batch, key="k").collect()} == {
        (1, "2024-01-01", None, "a", True)
    }


def test_round11_ops_on_empty_inputs(spark):
    """r11 additions: basket_pairs / audit on an empty item feed,
    sketch_epoch_rebuild with an empty change batch (nothing rescans,
    stored partials pass through) and with empty stored partials."""
    from medallion_delta_lake_spark.operators import sketches as sk
    from medallion_delta_lake_spark.operators.graph import (
        basket_cap_audit,
        basket_pairs,
    )

    empty_items = spark.createDataFrame([], "o bigint, p bigint")
    assert basket_pairs(empty_items, "o", "p").count() == 0
    audit = basket_cap_audit(empty_items, "o", "p").collect()[0]
    assert audit.n_baskets == 0 and audit.n_dropped == 0

    data = spark.createDataFrame(
        [(d, f"v{i}") for d in range(2) for i in range(10)],
        "day int, v string",
    )
    part = lambda df: sk.kmv_partials(df, ["day"], "v", k=8)  # noqa: E731
    stored = part(data)
    no_changes = spark.createDataFrame([], "day int")
    passthrough = sk.sketch_epoch_rebuild(
        data, stored, no_changes, "day", part
    )
    assert sorted(map(tuple, passthrough.collect())) == sorted(
        map(tuple, stored.collect())
    )
    empty_store = spark.createDataFrame([], stored.schema)
    all_new = sk.sketch_epoch_rebuild(
        data,
        empty_store,
        data.select("day").distinct(),
        "day",
        part,
    )
    assert sorted(map(tuple, all_new.collect())) == sorted(
        map(tuple, stored.collect())
    )
