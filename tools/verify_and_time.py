"""Per-change verification + timing: oracle-compare the given query ids
at sf0.001 and sf0.01, then time them at sf0.1 (bench methodology:
fn + count in one warm session; several reps, report all + min).

Usage: python tools/verify_and_time.py [--reps 3] [--skip-oracle] id [id ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from medallion_delta_lake_spark.session import get_spark  # noqa: E402
from medallion_delta_lake_spark.plans import registry  # noqa: E402
from tests.oracle import compare_query  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    q, o = entry.queries(), entry.oracle_sql()
    spark = get_spark(app_name="mdls-verify")
    spark.sparkContext.setLogLevel("ERROR")
    registry.table(spark, "/root/testdata/sf0.1", "region").count()

    if not args.skip_oracle:
        for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            for name in args.ids:
                compare_query(spark, name, q, o, sf_dir)
                print(f"oracle {sf_dir} {name}: OK", flush=True)

    for name in args.ids:
        times = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            df = q[name](spark, "/root/testdata/sf0.1")
            df.count()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"time sf0.1 {name}: {times} min={min(times)}", flush=True)


if __name__ == "__main__":
    main()
