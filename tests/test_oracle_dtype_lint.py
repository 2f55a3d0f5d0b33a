"""Oracle OUTPUT-dtype lint: no oracle may emit a HUGEINT column.

Root cause of every driver-red in rounds 8-10 (VERDICT r10): DuckDB's
``SUM(integer)`` and HUGEINT ``//`` return HUGEINT (int128). The
driver's value hasher renders int128 differently from Spark's int64,
so rows and schema match while the hash goes red — and the mismatch
never reproduces locally because tests/oracle.py compares *values*
(Python ints), which are equal. Exactly the 7 red ops of
CORRECTNESS_r10 — and none of the 284 green ones — had a HUGEINT
output column.

This lint makes the class structurally dead: every registered oracle
is *planned* (bound, not executed) in DuckDB against the sf0.001
views and its output column types are asserted free of
HUGEINT/UHUGEINT. An uncast ``SUM(int)`` in any future oracle fails
here before it can ship.

DOUBLE columns are deliberately NOT linted here — floats hash fine on
the driver (VERDICT r10 verified green DOUBLE faces); the Spark-side
DOUBLE discipline lives in tests/test_schema_lint.py.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from medallion_delta_lake_spark.catalog import TESTDATA_TABLES
from tests.conftest import SF_SMOKE

_BANNED = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return c


def _all_oracles() -> dict[str, str]:
    """Registered oracles plus any UNREGISTERED draft cohort — drafts
    are linted too so the HUGEINT class can't re-enter through a
    pre-built face (2 of the 14 r11 drafts carried it latently)."""
    out = dict(entry.oracle_sql())
    try:
        from medallion_delta_lake_spark.plans import queries_r12

        for k, v in queries_r12.R12_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    try:
        from medallion_delta_lake_spark.plans import queries_r13

        for k, v in queries_r13.R13_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    try:
        from medallion_delta_lake_spark.plans import queries_r14

        for k, v in queries_r14.R14_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    try:
        from medallion_delta_lake_spark.plans import queries_r15

        for k, v in queries_r15.R15_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    try:
        from medallion_delta_lake_spark.plans import queries_r16

        for k, v in queries_r16.R16_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    try:
        from medallion_delta_lake_spark.plans import queries_r17

        for k, v in queries_r17.R17_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    try:
        from medallion_delta_lake_spark.plans import queries_r18

        for k, v in queries_r18.R18_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    try:
        from medallion_delta_lake_spark.plans import queries_r19

        for k, v in queries_r19.R19_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    try:
        from medallion_delta_lake_spark.plans import queries_r20

        for k, v in queries_r20.R20_ORACLES.items():
            out.setdefault(f"draft:{k}", v)
    except ImportError:
        pass
    return out


def test_no_hugeint_oracle_outputs(con):
    problems: list[str] = []
    for name, sql in sorted(_all_oracles().items()):
        try:
            rel = con.sql(sql)  # binds + plans; does not execute
            types = [str(t).upper() for t in rel.types]
            cols = list(rel.columns)
        except Exception as ex:  # noqa: BLE001 — lint must name the op
            problems.append(f"{name}: oracle failed to bind: {ex!r:.160}")
            continue
        bad = [
            f"{c}:{t}"
            for c, t in zip(cols, types)
            if any(b in t for b in _BANNED)
        ]
        if bad:
            problems.append(
                f"{name}: HUGEINT output column(s) {bad} — CAST the "
                "integer SUM/`//` result to BIGINT in the oracle "
                "(driver hashes int128 differently from Spark int64)"
            )
    assert not problems, "\n".join(problems)
