"""Tracked caching for operator-internal intermediates.

The dedup/similarity operators cache intermediate frames (shingle sets,
signatures, buckets) that feed both sides of a self-join. Those caches
must outlive the operator call — the returned DataFrame is lazy and the
cache is only useful at the caller's action — so the operator cannot
unpersist them itself. ``tracked_cache`` registers every such cache;
callers (pipelines, benchmarks, long-lived sessions) call
``release_caches()`` after their terminal action to return the executor
memory. Per-query driver/sweep runs may skip it (the session ends);
anything long-lived should not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + registration for later :func:`release_caches`."""
    df.cache()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache (blocking); returns how many."""
    n = len(_LIVE)
    for df in _LIVE:
        try:
            df.unpersist(blocking=True)
        except Exception:  # session already stopped — nothing to free
            pass
    _LIVE.clear()
    return n
