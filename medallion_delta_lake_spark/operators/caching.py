"""Tracked caching for operator-internal intermediates.

The dedup/similarity operators cache intermediate frames (shingle sets,
signatures, buckets) that feed both sides of a self-join. Those caches
must outlive the operator call — the returned DataFrame is lazy and the
cache is only useful at the caller's action — so the operator cannot
unpersist them itself. ``tracked_cache`` registers every such cache.

Scoping: a caller that wants its caches released independently of any
other in-flight pipeline wraps its work in ``with cache_scope():`` —
operators invoked inside the block (same thread) register into that
scope, and the scope unpersists exactly those caches on exit. Outside
any scope, caches land in a process-global list that
``release_caches()`` drains; the list is lock-guarded, but the global
list is shared, so concurrent pipelines should each use their own
``cache_scope`` rather than calling ``release_caches()``.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_LOCK = threading.RLock()
_GLOBAL: list[DataFrame] = []
_SCOPES = threading.local()  # per-thread stack of active scopes


def _current() -> list[DataFrame]:
    stack = getattr(_SCOPES, "stack", None)
    return stack[-1] if stack else _GLOBAL


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + registration in the innermost active
    :func:`cache_scope` (or the global list when none is active)."""
    df.cache()
    with _LOCK:
        _current().append(df)
    return df


def _release(caches: list[DataFrame]) -> int:
    n = len(caches)
    for df in caches:
        try:
            df.unpersist(blocking=True)
        except Exception:  # session already stopped — nothing to free
            pass
    caches.clear()
    return n


@contextmanager
def cache_scope() -> Iterator[list[DataFrame]]:
    """Collect every ``tracked_cache`` registered on this thread inside
    the block and unpersist them (blocking) on exit. Scopes nest: the
    innermost active scope owns new registrations."""
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = []
        _SCOPES.stack = stack
    scope: list[DataFrame] = []
    stack.append(scope)
    try:
        yield scope
    finally:
        stack.pop()
        _release(scope)


def release_caches() -> int:
    """Unpersist every cache in the *global* (scope-less) list;
    returns how many. Caches inside an active :func:`cache_scope` are
    that scope's to release."""
    with _LOCK:
        caches = list(_GLOBAL)
        _GLOBAL.clear()
    return _release(caches)
