"""Per-query profiling harness (guide §1): split build vs action time,
dump .explain("formatted") to plans/r15/, label jobs.

Usage:
  python tools/profile_top.py [--plans-dir plans/r15] [--suffix before]
                              [--reps 1] id [id ...]

Timing methodology matches bench.py (one session, fn + count timed
together) but additionally reports the build/action split, so eager
staging work (Delta commits, streaming) is distinguishable from the
timed Spark action.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from medallion_delta_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q = entry.queries()
    spark = get_spark(app_name="mdls-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from medallion_delta_lake_spark.plans import registry

    registry.table(spark, sf_dir, "region").count()  # warm the session

    for name in args.ids:
        if name not in q:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = q[name](spark, sf_dir)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            print(
                f"{name} rep{rep}: total={t2 - t0:7.3f}s "
                f"build={t1 - t0:7.3f}s action={t2 - t1:7.3f}s rows={n}",
                flush=True,
            )
            if args.plans_dir and rep == 0:
                d = Path(args.plans_dir)
                d.mkdir(parents=True, exist_ok=True)
                p = d / f"{name}_{args.suffix}.txt"
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                p.write_text(buf.getvalue())
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
