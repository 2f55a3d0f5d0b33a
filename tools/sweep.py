"""Correctness sweep: run every registered query against its DuckDB
oracle (the driver's gate, locally runnable).

    python tools/sweep.py [sf_dir]        # default /root/testdata/sf0.01
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from medallion_delta_lake_spark.session import get_spark
    import __spark_entry__ as e
    from tests.oracle import compare_query

    spark = get_spark(app_name="mdls-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = e.queries(), e.oracle_sql()
    fails: list[tuple[str, str]] = []
    for name in sorted(queries):
        if name not in oracles:
            n = queries[name](spark, sf_dir).count()
            print(f"{name}: rows-only ({n} rows)")
            continue
        try:
            compare_query(spark, name, queries, oracles, sf_dir)
            print(f"{name}: OK")
        except Exception as ex:  # noqa: BLE001 - report and continue
            fails.append((name, str(ex)[:200]))
            print(f"{name}: FAIL {str(ex)[:200]}")
    print(
        f"\n{len(queries)} queries, {len(oracles)} oracle-checked, "
        f"{len(fails)} failures"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
