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
