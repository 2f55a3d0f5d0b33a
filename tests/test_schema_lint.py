"""Schema lint: no registered query may grow an unreviewed DOUBLE
column (the r8/r9 driver-red class — see
registry.DOUBLE_FACE_ALLOWLIST's docstring block).

Re-derives EVERY registered face at sf0.001 and diffs its
double/float columns against the allowlist, exactly: a new double
column (on a new or existing op) and a stale allowlist entry both
fail until reviewed."""

from __future__ import annotations

from pyspark.sql.types import DoubleType, FloatType

import __spark_entry__ as entry
from medallion_delta_lake_spark.plans.registry import (
    DOUBLE_FACE_ALLOWLIST,
)
from tests.conftest import SF_SMOKE


def test_double_faces_match_allowlist(spark):
    queries = entry.queries()
    problems: list[str] = []
    seen_with_doubles: set[str] = set()
    for name, fn in sorted(queries.items()):
        try:
            df = fn(spark, SF_SMOKE)
        except Exception as ex:  # noqa: BLE001 — lint must name the op
            problems.append(f"{name}: face failed to build: {ex!r:.120}")
            continue
        dbl = tuple(
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (DoubleType, FloatType))
        )
        if dbl:
            seen_with_doubles.add(name)
            want = DOUBLE_FACE_ALLOWLIST.get(name)
            if want is None:
                problems.append(
                    f"{name}: UNREVIEWED double columns {dbl} — "
                    "carry exact integers (q_div) or review into "
                    "registry.DOUBLE_FACE_ALLOWLIST"
                )
            elif tuple(want) != dbl:
                problems.append(
                    f"{name}: double columns {dbl} != allowlisted "
                    f"{tuple(want)}"
                )
    stale = set(DOUBLE_FACE_ALLOWLIST) - seen_with_doubles
    for name in sorted(stale):
        problems.append(
            f"{name}: allowlisted but no longer emits doubles "
            "(or is unregistered) — remove the stale entry"
        )
    assert not problems, "\n".join(problems)


def test_bench_sees_full_registry():
    """bench.py must bench every registered face: its old per-module
    import ladder silently dropped the r13/r14 cohorts (319 of 339
    benched in the first r13 run). It now registers through the
    driver entry itself; this pins that the two surfaces can never
    diverge again."""

    import bench  # noqa: F401 — importing registers via __spark_entry__
    from medallion_delta_lake_spark.plans import registry

    entry_names = set(entry.queries())
    assert set(registry.QUERIES) == entry_names, (
        "bench-visible registry diverges from the driver entry"
    )
