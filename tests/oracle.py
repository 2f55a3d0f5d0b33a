"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted).
Exact comparison — the registry's decimal-accumulation contract makes
floats bit-identical across engines, so no tolerance is applied.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from medallion_delta_lake_spark.catalog import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    return v


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def compare_query(spark, name: str, queries: dict, oracles: dict, sf_dir: str):
    """Assert Spark result == DuckDB oracle result for op-id ``name``."""
    sdf = queries[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(oracles[name], sf_dir)

    sc, sr = canonical(s_cols, s_rows)
    oc, orows = canonical(o_cols, o_rows)
    assert sc == oc, f"{name}: column mismatch {sc} vs {oc}"
    assert len(sr) == len(orows), f"{name}: row count {len(sr)} vs {len(orows)}"
    mismatches = [
        (a, b) for a, b in zip(sr, orows) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
