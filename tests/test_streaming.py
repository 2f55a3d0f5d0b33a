"""Streaming tests: oracle parity for the registered streaming queries
plus the applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)
from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans import queries_stream  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES, table
from medallion_delta_lake_spark.streaming import events as se
from medallion_delta_lake_spark.streaming import stateful
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

STREAM_IDS = sorted(n for n in QUERIES if n.startswith("stream-") and n in ORACLES)


@pytest.mark.parametrize("name", STREAM_IDS)
def test_stream_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


def test_stateful_user_running_stats(spark):
    """applyInPandasWithState running per-user stats: after consuming
    the whole (single-file → single-batch) input, the final state per
    user must equal the batch aggregate."""
    sdf = se.read_events_stream(spark, SF_SMOKE)
    out = se.run_available_now(
        stateful.user_running_stats(sdf), "update", spark
    )
    # one batch → one emitted row per user, already the final state
    got = {r.user_id: (r.n_events, r.total_value) for r in out.collect()}

    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    assert len(got) == len(batch)
    for r in batch:
        n, tv = got[r.user_id]
        assert n == r.n
        assert tv == pytest.approx(r.tv, rel=1e-9)


def test_streaming_session_window_matches_batch(spark):
    """Batch/stream duality for session windows: the streaming
    session_window plan over the full input must equal the batch
    sessionize result."""
    from medallion_delta_lake_spark.operators import window as win

    sdf = se.read_events_stream(spark, SF_SMOKE)
    streamed = se.run_available_now(se.session_agg(sdf), "complete", spark)
    got = {tuple(r) for r in streamed.collect()}

    ev = table(spark, SF_SMOKE, "events").select("user_id", "ts", "event_id")
    batch = win.sessionize(ev, ["user_id"], "ts", gap="30 minutes")
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    assert got == expected


def test_stream_upsert_foreachbatch(spark, tmp_path):
    """Streaming → keyed upsert: after consuming the stream, the table
    holds the latest event per user (same dedup rule as the batch
    upsert's version path)."""
    from medallion_delta_lake_spark.operators import upsert as upsert_mod
    from medallion_delta_lake_spark.sources import readers
    from medallion_delta_lake_spark.streaming import sink

    path = str(tmp_path / "user_latest")
    sdf = se.read_events_stream(spark, SF_SMOKE).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    sink.stream_upsert(sdf, spark, path, keys=["user_id"], version_col="ts")

    got = {
        r.user_id: (r.ts, r.event_id)
        for r in readers.scan_table(spark, path).collect()
    }
    batch = table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    expected = {
        r.user_id: (r.ts, r.event_id)
        for r in upsert_mod.dedup_source_by_key(
            batch, ["user_id"], version_col="ts"
        ).collect()
    }
    assert got == expected


def test_stream_upsert_checkpoint_exactly_once(spark, tmp_path):
    """Re-running the same stream against the same checkpoint processes
    nothing new (source offsets are committed): the table state is
    unchanged — streaming ingestion is exactly-once end to end."""
    from medallion_delta_lake_spark.sources import readers
    from medallion_delta_lake_spark.streaming import sink

    path = str(tmp_path / "ckpt_target")
    sdf = se.read_events_stream(spark, SF_SMOKE).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    sink.stream_upsert(sdf, spark, path, keys=["user_id"], version_col="ts")
    state1 = sorted(
        tuple(r) for r in readers.scan_table(spark, path).collect()
    )

    sdf2 = se.read_events_stream(spark, SF_SMOKE).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    sink.stream_upsert(sdf2, spark, path, keys=["user_id"], version_col="ts")
    state2 = sorted(
        tuple(r) for r in readers.scan_table(spark, path).collect()
    )
    assert state1 == state2


def test_stream_multi_microbatch_dedup(spark, tmp_path):
    """Multi-microbatch semantics: with maxFilesPerTrigger=1 the same
    dedup state must span batches — a key seen in batch 1 is not
    re-emitted by batch 2."""
    src = str(tmp_path / "src")
    ev = table(spark, SF_SMOKE, "events").select("user_id", "event_type")
    # two overlapping files → guaranteed cross-batch duplicate keys
    ev.limit(2000).coalesce(1).write.mode("overwrite").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)

    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = se.run_available_now(
        se.stream_dedup_keys(sdf, ["user_id", "event_type"]), "append", spark
    )
    rows = [(r.user_id, r.event_type) for r in out.collect()]
    assert len(rows) == len(set(rows))  # no key emitted twice
    assert set(rows) == {
        (r.user_id, r.event_type) for r in ev.distinct().collect()
    }


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics across restarts: run 1 processes an hour-0
    and an hour-6 event (watermark advances to 04:00 and is persisted
    in the checkpoint); run 2 delivers a late hour-0 event — it must be
    DROPPED, so the hour-0 window's total count stays 1."""
    import datetime as dt

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, "ts timestamp, v int")

    out_dir = str(tmp_path / "late_out")

    def run_once():
        sdf = spark.readStream.schema("ts timestamp, v int").parquet(src)
        agg = (
            sdf.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = spark.read.schema("ws timestamp, n long").parquet(out_dir)
        return [(r.ws, r.n) for r in emitted.collect()]

    mk([(t0, 1), (t0 + dt.timedelta(hours=6), 1)]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    out1 = run_once()

    mk([(t0 + dt.timedelta(minutes=5), 1)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = run_once()

    # out2 is cumulative (file sink accumulates); the late hour-0 row
    # must have been dropped: every emitted hour-0 record counts 1 row,
    # and no second hour-0 record appears after run 2
    hour0 = [n for ws, n in out2 if ws == t0]
    assert sum(hour0) <= 1, (out1, out2)


def test_watermark_finalized_window_emits_at_most_once(spark, tmp_path):
    """What the watermark actually GUARANTEES in append mode (pinned
    empirically on this Spark: late-row dropping is best-effort and
    does NOT happen while a window's state is still live — a late row
    arriving before eviction is aggregated): once the watermark passes
    a window and append mode emits it, that window can never re-emit,
    even if later-still rows for it arrive. State is bounded and
    results are at-most-once per window."""
    import glob as _glob
    import os
    import time as _time
    import uuid

    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()

    def write(name, rows):
        spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.parquet(str(src / name))

    # batch 0: 12:00 row (advances watermark to 11:00) + a 10:15 row
    write("f1", [(1, "2024-01-01 12:00:00", 1.0),
                 (2, "2024-01-01 10:15:00", 1.0)])
    # batch 1: 13:30 row -> watermark 12:30 -> the 10:00 window is
    # evicted and emitted
    write("f2", [(3, "2024-01-01 13:30:00", 1.0)])
    # batch 2: very late 10:45 row: its window was already finalized;
    # it must NOT produce a second 10:00 emission
    write("f3", [(4, "2024-01-01 10:45:00", 1.0)])

    now = _time.time()
    for i, d in enumerate(("f1", "f2", "f3")):
        for f in _glob.glob(str(src / d / "*")):
            os.utime(f, (now - 300 + i * 100, now - 300 + i * 100))

    schema = spark.read.parquet(str(src / "f1")).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    agged = (
        sdf.withWatermark("ts", "1 hour")
        # group on the window struct itself: projecting .start inside
        # the groupBy strips the event-time attribute and append mode
        # then rejects the plan as "aggregation without watermark"
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agged.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(str(r.ws), r.n) for r in spark.table(name).collect()]
    ten = [r for r in rows if r[0].startswith("2024-01-01 10:")]
    # emitted exactly once, with the pre-eviction count (the very late
    # batch-2 row is excluded — its window was already finalized)
    assert ten == [("2024-01-01 10:00:00", 1)]


def test_stream_dedup_ingest_incremental_store(spark, tmp_path):
    """Streaming corpus ingest with dedup at the door: batch 2 must not
    re-admit batch-1 near-duplicates (history is the persistent LSH
    store, never re-hashed), within-batch duplicates collapse, and a
    checkpoint re-run appends nothing (exactly-once)."""
    from medallion_delta_lake_spark.streaming import sink

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "sigstore")
    base = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank every single morning without fail whatever the weather"
    )
    alt = (
        "completely different document describing spark structured "
        "streaming checkpoint semantics for exactly once file ingest"
    )

    def run_ingest():
        sdf = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
        )
        sink.stream_dedup_ingest(sdf, spark, corpus, store)
        return sorted(r.doc_id for r in spark.read.parquet(corpus).collect())

    # batch 1: two distinct docs + an in-batch exact duplicate of doc 1
    spark.createDataFrame(
        [(1, base), (2, alt), (3, base)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    assert run_ingest() == [1, 2]  # 3 collapsed onto 1 within-batch

    # batch 2: a verbatim re-arrival of doc 1 (identical signature ->
    # every band matches the store; sub-identical recall levels are
    # pinned by test_incremental_dedup.py), plus one genuinely novel doc
    near = base
    novel = (
        "totally unrelated text about tokenizer vocabularies byte "
        "pair encodings and deterministic training data mixtures"
    )
    spark.createDataFrame(
        [(10, near), (11, novel)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    assert run_ingest() == [1, 2, 11]  # 10 matched history, dropped

    # re-run with nothing new: checkpoint admits nothing twice
    assert run_ingest() == [1, 2, 11]


def test_stream_append_delta_log_exactly_once(spark, tmp_path):
    """SetTransaction-gated streaming append: microbatches land as
    txn-stamped commits on the log-backed table; re-running the same
    source against a FRESH streaming checkpoint (so every batch
    replays) must append nothing — last_txn_version already covers the
    batch ids (Delta's txn idempotence contract)."""
    import shutil

    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.sources import delta_log
    from medallion_delta_lake_spark.streaming.sink import (
        stream_append_delta_log,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    spark.range(40).withColumn("v", F.col("id") * 3).coalesce(2).write.parquet(src)

    sdf = spark.readStream.schema("id long, v long").parquet(src)
    stream_append_delta_log(sdf, spark, tgt, app_id="ingest-a")
    assert delta_log.read_delta(spark, tgt).count() == 40
    assert delta_log.last_txn_version(tgt, "ingest-a") >= 0
    assert delta_log.last_txn_version(tgt, "other-app") == -1

    # checkpoint dirs are PER APP ID (r6 ADVICE: two apps appending to
    # one table must not clobber each other's offsets/batch ids)
    import os

    assert os.path.isdir(tgt + "__append_checkpoint_ingest-a")

    # wipe the STREAM's checkpoint (not the table) → full replay
    shutil.rmtree(tgt + "__append_checkpoint_ingest-a")
    sdf2 = spark.readStream.schema("id long, v long").parquet(src)
    stream_append_delta_log(sdf2, spark, tgt, app_id="ingest-a")
    assert delta_log.read_delta(spark, tgt).count() == 40  # no dupes

    # a different app id is a different transaction stream → appends
    # (its checkpoint dir is its own; no rmtree needed)
    sdf3 = spark.readStream.schema("id long, v long").parquet(src)
    stream_append_delta_log(sdf3, spark, tgt, app_id="ingest-b")
    assert delta_log.read_delta(spark, tgt).count() == 80
    assert os.path.isdir(tgt + "__append_checkpoint_ingest-b")


def test_txn_watermark_survives_checkpoint_and_duplicate_refused(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from medallion_delta_lake_spark.sources import delta_log

    t = str(tmp_path / "txn_tab")
    df = spark.range(5).withColumn("v", F.col("id"))
    delta_log.write_delta(spark, df, t, mode="append", txn=("app", 7))
    assert delta_log.last_txn_version(t, "app") == 7
    # duplicate (appId, version) must be refused commit-side
    import pytest as _pytest

    with _pytest.raises(delta_log.DeltaConcurrentWriteError):
        delta_log.write_delta(spark, df, t, mode="append", txn=("app", 7))
    # checkpoint must carry the watermark forward
    delta_log.write_checkpoint(t)
    assert delta_log.last_txn_version(t, "app") == 7
    delta_log.write_delta(spark, df, t, mode="append", txn=("app", 8))
    assert delta_log.last_txn_version(t, "app") == 8


def test_stream_holt_multi_microbatch_equals_batch(spark, tmp_path):
    """The streaming Holt smoother's (level, trend) state must span
    microbatches: feeding a per-user-ordered series as two time-split
    files (one per batch) ends in exactly the batch recursion's final
    state."""
    from medallion_delta_lake_spark.operators.pandas_ops import holt_linear
    from medallion_delta_lake_spark.streaming import stateful

    rows = [
        (u, i, float(v))
        for u in (1, 2)
        for i, v in enumerate([4, 8, 2, 10, 6, 1, 9, 5])
    ]
    df = (
        spark.createDataFrame(
            rows, "user_id long, n int, value double"
        )
        .select(
            "user_id",
            (
                F.to_timestamp(F.lit("2024-01-01"))
                + F.make_interval(secs=F.col("n") * 60)
            ).alias("ts"),
            F.col("n").cast("long").alias("event_id"),
            "value",
        )
    )
    src = str(tmp_path / "holt_src")
    df.filter(F.col("event_id") < 4).coalesce(1).write.parquet(src)
    df.filter(F.col("event_id") >= 4).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = se.run_available_now(
        stateful.holt_monitor(sdf), "update", spark
    )
    final = {}
    for r in out.collect():  # update mode re-emits: keep last per key
        final[r.user_id] = (r.n_obs, r.level, r.trend)

    b = holt_linear(
        df.select(
            "user_id", F.col("event_id").alias("step"),
            F.col("value").alias("x"),
        ),
        "user_id",
        "step",
        "x",
    )
    last = {
        r.user_id: (r.level, r.trend)
        for r in b.filter(F.col("step") == 7).collect()
    }
    assert set(final) == {1, 2}
    for u in final:
        assert final[u][0] == 8
        assert (final[u][1], final[u][2]) == last[u]
