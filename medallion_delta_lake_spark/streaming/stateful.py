"""Custom stateful streaming operators (applyInPandasWithState).

For semantics Spark's built-in streaming aggregates can't express —
running per-key accumulators emitted every microbatch, custom session
logic, enrichment against evolving state. Arrow-batched: each call
receives the group's rows as pandas DataFrames, state is a typed
tuple; this is the blessed custom-stateful path (no RDD, no
row-at-a-time Python).

Scale notes: state lives in the state store partitioned by the group
key — O(distinct keys) rows of fixed width here. The watermark (set by
the caller on the input) bounds how long idle keys are retained when a
timeout is configured.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

USER_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
USER_STATS_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total_cents", LongType()),
    ]
)


def _user_stats_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    # accumulate integer cents (inputs have 2 decimals): exact,
    # batch-order-independent, and bit-identical to the decimal-exact
    # batch/SQL twin — the engine's float-determinism contract extended
    # into custom state
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": cents / 100.0}]
    )


def user_running_stats(sdf: DataFrame) -> DataFrame:
    """Running (count, sum) per user, emitted every microbatch the user
    appears in — a custom stateful accumulator Spark's built-in
    streaming agg can't emit in update-per-batch form with arbitrary
    Python post-processing."""
    return sdf.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cusum_max", DoubleType()),
        StructField("n_points", LongType()),
    ]
)
CUSUM_STATE = StructType(
    [
        StructField("prefix_cents", LongType()),
        StructField("min_prefix_cents", LongType()),
        StructField("max_exc_cents", LongType()),
        StructField("n", LongType()),
    ]
)


def cusum_monitor(sdf: DataFrame, target: float) -> DataFrame:
    """Streaming one-sided CUSUM drift monitor per user — the
    change-point alarm maintained incrementally:
    ``S_i = max(0, S_{i-1} + (x_i − target))`` with the running
    maximum emitted every microbatch the key appears in. State is four
    integer-cents longs (prefix sum, its running minimum capped at 0,
    the max excursion, n) — exact, so after ordered arrival the
    maintained statistic equals the batch closed form
    (operators/window.py:cusum_drift with the same fixed target)
    bit-for-bit. Rows are sorted by (ts, event_id) WITHIN each batch;
    cross-batch order is arrival order — the usual streaming-CUSUM
    contract (a late row shifts when drift is noticed, not whether).
    """
    import numpy as np

    target_cents = int(round(target * 100))

    def fn(key, pdfs, state: GroupState):
        p, mn, mx, n = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        for pdf in pdfs:
            pdf = pdf.dropna(subset=["value"]).sort_values(
                ["ts", "event_id"]
            )
            if not len(pdf):
                continue
            dev = (
                (pdf["value"] * 100).round().astype("int64")
                - target_cents
            ).to_numpy()
            prefix = p + np.cumsum(dev)
            run_min = np.minimum(np.minimum.accumulate(prefix), mn)
            exc = prefix - np.minimum(run_min, 0)
            p = int(prefix[-1])
            mn = int(run_min[-1])
            mx = max(mx, int(exc.max()))
            n += len(pdf)
        state.update((p, mn, mx, n))
        if n:  # a key whose rows were all-null emits nothing
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "cusum_max": mx / 100.0,
                        "n_points": n,
                    }
                ]
            )
        else:
            yield pd.DataFrame(
                {"user_id": [], "cusum_max": [], "n_points": []}
            )

    return (
        sdf.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=CUSUM_OUTPUT,
            stateStructType=CUSUM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


GAP_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("max_gap_us", LongType()),
        StructField("n_events", LongType()),
    ]
)
GAP_STATE = StructType(
    [
        StructField("last_us", LongType()),
        StructField("max_gap_us", LongType()),
        StructField("n", LongType()),
    ]
)


def gap_monitor(sdf: DataFrame) -> DataFrame:
    """Streaming feed-liveness monitor — each key's MAXIMUM
    inter-arrival gap, maintained incrementally ("did this source go
    dark, and for how long"): state is (last event time, max gap,
    count) in integer MICROSECONDS, so after ordered arrival the
    maintained value equals the batch LAG closed form (the
    window-gap-report family) bit-for-bit — timestamps are exact
    integers, no float drift possible. Keys seen once emit a NULL gap
    (one point has no interval). Rows sort by (ts, event_id) within
    each batch; cross-batch order is arrival order, the same contract
    as :func:`cusum_monitor`."""
    def fn(key, pdfs, state: GroupState):
        last, mx, n = state.get if state.exists else (-1, -1, 0)
        for pdf in pdfs:
            pdf = pdf.dropna(subset=["ts"]).sort_values(
                ["ts", "event_id"]
            )
            if not len(pdf):
                continue
            us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            if last >= 0:
                mx = max(mx, int(us[0]) - last)
            if len(us) > 1:
                mx = max(mx, int((us[1:] - us[:-1]).max()))
            last = int(us[-1])
            n += len(us)
        state.update((last, mx, n))
        if n:
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "max_gap_us": mx if mx >= 0 else None,
                        "n_events": n,
                    }
                ]
            )
        else:
            yield pd.DataFrame(
                {"user_id": [], "max_gap_us": [], "n_events": []}
            )

    return (
        sdf.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=GAP_OUTPUT,
            stateStructType=GAP_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HOLT_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_obs", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
    ]
)
HOLT_STATE = StructType(
    [
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("n", LongType()),
    ]
)


def holt_monitor(
    sdf: DataFrame, alpha: float = 0.5, beta: float = 0.5
) -> DataFrame:
    """Streaming Holt level+trend smoother per key — the incremental
    twin of the batch ``operators/pandas_ops.py:holt_linear``: state is
    exactly (level, trend, n) and each arriving observation applies the
    same literal recurrence
    ``l' = α·x + (1−α)·(l+b); b' = β·(l'−l) + (1−β)·b``, so after
    ordered arrival the maintained state equals the batch recursion
    bit-for-bit (α = β = ½ are exact binary scalings; float64 state
    round-trips the state store unchanged). Rows sort by
    (ts, event_id) within each microbatch; cross-batch order is arrival
    order — the same contract as :func:`cusum_monitor`. The emitted
    (level, trend) is the forecasting state a monitoring surface reads
    (one-step forecast = level + trend)."""
    a, b1 = float(alpha), float(beta)

    def fn(key, pdfs, state: GroupState):
        lvl, trd, n = state.get if state.exists else (0.0, 0.0, 0)
        for pdf in pdfs:
            pdf = pdf.dropna(subset=["value"]).sort_values(
                ["ts", "event_id"]
            )
            for x in pdf["value"].to_numpy(dtype="float64"):
                if n == 0:
                    lvl, trd = float(x), 0.0
                else:
                    nxt = a * x + (1.0 - a) * (lvl + trd)
                    trd = b1 * (nxt - lvl) + (1.0 - b1) * trd
                    lvl = nxt
                n += 1
        state.update((lvl, trd, n))
        if n:
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_obs": n,
                        "level": lvl,
                        "trend": trd,
                    }
                ]
            )
        else:
            yield pd.DataFrame(
                {"user_id": [], "n_obs": [], "level": [], "trend": []}
            )

    return (
        sdf.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=HOLT_OUTPUT,
            stateStructType=HOLT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CROSTON_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_obs", LongType()),
        StructField("z", DoubleType()),
        StructField("p", DoubleType()),
        StructField("demand_rate", DoubleType()),
    ]
)
CROSTON_STATE = StructType(
    [
        StructField("z", DoubleType()),
        StructField("p", DoubleType()),
        StructField("q", LongType()),
        StructField("n", LongType()),
        StructField("started", LongType()),
    ]
)


def croston_monitor(sdf: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Streaming Croston intermittent-demand smoother per key — the
    incremental twin of ``operators/pandas_ops.py:croston``: state is
    (z, p, q, n, started) and each arriving observation applies the
    same literal recurrence (x > 0 → ``z' = α·x + (1−α)·z``,
    ``p' = α·q + (1−α)·p``, q resets; x = 0 → q grows, smoothers
    hold), so after ordered arrival the maintained state equals the
    batch recursion bit-for-bit — the same contract
    :func:`holt_monitor` pins. Emits (z, p, demand_rate = z/p) per
    key per microbatch; NULLs before the first demand. Zero-valued
    and NULL observations count as no-demand steps."""
    a = float(alpha)

    def fn(key, pdfs, state: GroupState):
        z, p, q, n, started = (
            state.get if state.exists else (0.0, 0.0, 0, 0, 0)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for x in (
                pdf["value"].fillna(0.0).to_numpy(dtype="float64")
            ):
                n += 1
                q += 1
                if x > 0.0:
                    if not started:
                        z, p, started = float(x), float(q), 1
                    else:
                        z = a * x + (1.0 - a) * z
                        p = a * q + (1.0 - a) * p
                    q = 0
        state.update((z, p, q, n, started))
        if n and started:
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_obs": n,
                        "z": z,
                        "p": p,
                        "demand_rate": z / p,
                    }
                ]
            )
        else:
            yield pd.DataFrame(
                {
                    "user_id": [],
                    "n_obs": [],
                    "z": [],
                    "p": [],
                    "demand_rate": [],
                }
            )

    return (
        sdf.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=CROSTON_OUTPUT,
            stateStructType=CROSTON_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------------------------
# Streaming Count-Min heavy hitters

CMS_TOPK_OUTPUT_FIELDS = "event_type string, item string, est_cnt long"

def cms_topk_monitor(
    sdf: DataFrame, d: int = 4, w: int = 256, k: int = 10
) -> DataFrame:
    """Streaming heavy hitters per ``event_type``: a Count-Min
    counter matrix plus a candidate set maintained across
    microbatches — the streaming twin of
    ``operators/sketches.py:cms_partials``/``cms_query``.

    State per group = the d·w counter matrix (flattened array<long>)
    + at most ``k + batch-distinct`` candidate items. Each microbatch:
    (1) every arriving item increments its d counters — counter state
    after any split of the stream EQUALS the batch sketch exactly
    (sums commute); (2) candidate estimates are RECOMPUTED against
    the current counters (never cached across batches — a stale
    estimate could under-rank an item whose buckets grew), merged
    with the batch's distinct items, and the top k by
    (estimate DESC, item ASC) are kept and emitted. CMS guarantees
    estimates never under-count, so a true heavy hitter — which must
    appear in some batch — can never be evicted by an item with a
    smaller true count unless collisions inflate the latter past it
    (the standard ε·N bound).

    Hashing is the SAME portable md5-h64 + universal-hash family the
    batch sketch uses (functions/hashing.py), evaluated in Python
    here (the Arrow path hands us pandas) — pinned equal to the batch
    estimates in tests/test_cms_stream.py."""
    import hashlib

    from medallion_delta_lake_spark.functions.hashing import (
        P_HASH,
        minhash_params,
    )

    params = minhash_params(d)
    p_hash = P_HASH

    def buckets(item: str) -> list[int]:
        h = int(hashlib.md5(item.encode("utf-8")).hexdigest()[:15], 16)
        hm = h % p_hash
        return [(a * hm + b) % p_hash % w for a, b in params]

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            counters, items, _counts = state.get
            counters = list(counters)
            cand = set(items)
        else:
            counters = [0] * (d * w)
            cand = set()
        batch_items: set[str] = set()
        for pdf in pdfs:
            for item in pdf["item"].dropna().astype(str):
                batch_items.add(item)
                for i, b in enumerate(buckets(item)):
                    counters[i * w + b] += 1

        def est(item: str) -> int:
            return min(
                counters[i * w + b]
                for i, b in enumerate(buckets(item))
            )

        # recompute ALL candidate estimates against current counters
        scored = sorted(
            ((est(it), it) for it in cand | batch_items),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        state.update(
            (
                counters,
                [it for _, it in scored],
                [e for e, _ in scored],
            )
        )
        yield pd.DataFrame(
            [
                {"event_type": key[0], "item": it, "est_cnt": e}
                for e, it in scored
            ],
            columns=["event_type", "item", "est_cnt"],
        )

    from pyspark.sql.types import ArrayType, StringType

    state_schema = StructType(
        [
            StructField("counters", ArrayType(LongType())),
            StructField("items", ArrayType(StringType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )
    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("item", StringType()),
            StructField("est_cnt", LongType()),
        ]
    )
    return (
        sdf.select("event_type", "item")
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------------------------
# Streaming KMV distinct-count


def kmv_distinct_monitor(sdf: DataFrame, k: int = 256) -> DataFrame:
    """Streaming distinct-count per ``event_type`` via the KMV
    bottom-k sketch — the streaming twin of
    ``operators/sketches.py:kmv_partials``/``kmv_estimate``. State
    per group is the k smallest distinct portable hashes seen so far;
    because bottom-k folding is the sketch's own MERGE LAW, the state
    after ANY microbatch split equals the batch sketch of the same
    rows exactly — so the emitted (n_kept, h_k, est_q6) triple is
    pinned bit-for-bit against the batch operator in
    tests/test_kmv_stream.py, not just statistically close.

    est_q6 = n_kept·10^6 exactly while the set still fits (< k),
    else trunc((k−1)·2^60/h_k·10^6) — integer arithmetic only, same
    face as the batch estimator."""
    import hashlib

    def h60(item: str) -> int:
        return int(
            hashlib.md5(item.encode("utf-8")).hexdigest()[:15], 16
        )

    def fn(key, pdfs, state: GroupState):
        kept = list(state.get[0]) if state.exists else []
        have = set(kept)
        for pdf in pdfs:
            for item in pdf["item"].dropna().astype(str):
                h = h60(item)
                if h not in have:
                    have.add(h)
                    kept.append(h)
        kept = sorted(have)[:k]
        state.update((kept,))
        n_kept = len(kept)
        h_k = kept[-1] if kept else 0
        if n_kept < k:
            est_q6 = n_kept * 10**6
        else:
            est_q6 = (k - 1) * (1 << 60) * 10**6 // h_k
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "n_kept": n_kept,
                    "h_k": h_k,
                    "est_q6": est_q6,
                }
            ]
        )

    from pyspark.sql.types import ArrayType, StringType

    state_schema = StructType(
        [StructField("kept", ArrayType(LongType()))]
    )
    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("n_kept", LongType()),
            StructField("h_k", LongType()),
            StructField("est_q6", LongType()),
        ]
    )
    return (
        sdf.select("event_type", "item")
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------------------------
# Streaming HDR-histogram quantiles


def hdr_quantile_monitor(
    sdf: DataFrame, sub_bits: int = 5, qs=(500, 900, 990)
) -> DataFrame:
    """Streaming quantile estimates per ``event_type`` from an
    HDR-histogram bin state — the streaming twin of
    ``operators/sketches.py:hdr_partials``/``hdr_quantiles``. State
    per group is the (b, sub) → n bin map (bounded: ≤ 64·2^sub_bits
    entries regardless of stream length); bins sum across
    microbatches, which IS the sketch's merge law, so the state after
    any stream split equals the batch bin table exactly and the
    emitted quantiles match the batch operator bit-for-bit (pinned).

    Input needs an integer ``v`` column (micro-quantized upstream);
    emits (event_type, q_permille, est) per group per microbatch with
    est = the nearest-rank bin's lower bound — exact integers."""

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            bs, subs, ns = state.get
            bins = {
                (int(b), int(s)): int(n)
                for b, s, n in zip(bs, subs, ns)
            }
        else:
            bins = {}
        for pdf in pdfs:
            for v in pdf["v"].dropna().astype("int64"):
                v = int(v)
                if v < 0:
                    continue
                bl = v.bit_length()
                b = max(bl - sub_bits, 0)
                key_bin = (b, v >> b)
                bins[key_bin] = bins.get(key_bin, 0) + 1
        items = sorted(bins.items())
        state.update(
            (
                [b for (b, _), _ in items],
                [s for (_, s), _ in items],
                [n for _, n in items],
            )
        )
        total = sum(bins.values())
        rows = []
        if total:
            ordered = sorted(
                ((s << b, n) for (b, s), n in bins.items())
            )
            for qp in qs:
                rank = (total * qp + 999) // 1000
                cum = 0
                for lower, n in ordered:
                    cum += n
                    if cum >= rank:
                        rows.append(
                            {
                                "event_type": key[0],
                                "q_permille": qp,
                                "est": lower,
                            }
                        )
                        break
        yield pd.DataFrame(
            rows, columns=["event_type", "q_permille", "est"]
        )

    from pyspark.sql.types import ArrayType, IntegerType, StringType

    state_schema = StructType(
        [
            StructField("bs", ArrayType(IntegerType())),
            StructField("subs", ArrayType(LongType())),
            StructField("ns", ArrayType(LongType())),
        ]
    )
    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("q_permille", IntegerType()),
            StructField("est", LongType()),
        ]
    )
    return (
        sdf.select("event_type", "v")
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
