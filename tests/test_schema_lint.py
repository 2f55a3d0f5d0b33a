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

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)


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
    benched in the first r13 run). The r13 pin was a tautology —
    entry.queries() and registry.QUERIES came from the same process,
    so it could never fail (ADVICE r13). Assert on bench.py's actual
    MECHANISM instead: (a) a fresh subprocess that imports only
    ``bench`` must end up with the full registry count, and (b)
    bench.py must register through ``__spark_entry__`` with no
    per-module plans import ladder of its own."""

    import ast
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    want = len(entry.queries())

    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import bench; "
            "from medallion_delta_lake_spark.plans import registry; "
            "print(len(registry.QUERIES))",
        ],
        cwd=root,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = int(proc.stdout.strip().splitlines()[-1])
    assert got == want, (
        f"importing bench registers {got} queries; the driver entry "
        f"has {want} — bench.py's registration path rotted again"
    )

    tree = ast.parse((root / "bench.py").read_text())
    imports_entry = False
    ladder: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            if any(a.name == "__spark_entry__" for a in node.names):
                imports_entry = True
        elif isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            if mod.endswith(".plans") or ".plans." in mod:
                ladder.extend(
                    a.name
                    for a in node.names
                    if a.name.startswith("queries_")
                )
            if mod.endswith(".plans") and any(
                a.name == "registry" for a in node.names
            ):
                continue
    assert imports_entry, "bench.py must register via __spark_entry__"
    assert not ladder, (
        f"bench.py grew a per-module import ladder again: {ladder}"
    )
