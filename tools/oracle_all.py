"""Run every registered query against the DuckDB oracle (driver replica).

Usage: python tools/oracle_all.py [--shard i/k] [--ids a,b,...] [sf_dir ...]
Prints one line per op and a final JSON summary; exits non-zero on any red.
``--shard i/k`` takes every k-th id starting at i (for parallel sweeps —
each shard is its own Spark session, so runs are independent).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from medallion_delta_lake_spark.operators import caching  # noqa: E402
from medallion_delta_lake_spark.session import get_spark  # noqa: E402
from tests.oracle import compare_query  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    shard_i, shard_k = 0, 1
    only_ids: list[str] | None = None
    if argv and argv[0] == "--shard":
        shard_i, shard_k = (int(x) for x in argv[1].split("/"))
        argv = argv[2:]
    if argv and argv[0] == "--ids":
        only_ids = argv[1].split(",")
        argv = argv[2:]
    sf_dirs = argv or ["/root/testdata/sf0.001"]
    q, o = entry.queries(), entry.oracle_sql()
    if only_ids is not None:
        q = {k: q[k] for k in only_ids}
    q = {k: q[k] for i, k in enumerate(sorted(q)) if i % shard_k == shard_i}
    spark = get_spark(app_name="oracle-all")
    spark.sparkContext.setLogLevel("ERROR")
    failed: dict[str, str] = {}
    for sf_dir in sf_dirs:
        for i, name in enumerate(sorted(q)):
            t0 = time.perf_counter()
            try:
                compare_query(spark, name, q, o, sf_dir)
                status = "ok"
            except Exception as exc:  # noqa: BLE001
                failed[f"{sf_dir}:{name}"] = f"{type(exc).__name__}: {exc}"[:400]
                status = "FAIL"
            dt = time.perf_counter() - t0
            print(f"[{i + 1}/{len(q)}] {sf_dir} {name}: {status} {dt:.1f}s", flush=True)
            # ADVICE r15: hundreds of queries in one session accumulate
            # tracked operator caches — release between ids so long
            # sweeps don't build memory pressure / eviction noise.
            caching.release_caches()
    print(json.dumps({"n": len(q), "sf_dirs": sf_dirs, "failed": failed}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
