"""Steal-gated per-query timing (the bench_gated.sh protocol, per id).

For each query id: wait for a quiet window (probe steal over
``--probe`` seconds until < ``--gate``), run one timed rep bracketed
by /proc/stat steal, accept the rep only if its own bracketed steal is
below the gate; repeat until ``--accept`` accepted reps (or
``--max-tries``). Prints every rep with its steal; summary line per id
uses the min of ACCEPTED reps only.

Usage: python tools/quiet_time.py [--accept 2] [--gate 0.5] id [id ...]
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


def ticks():
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:9]]
    return vals[7], sum(vals)


def steal_over(sec: float) -> float:
    s0, t0 = ticks()
    time.sleep(sec)
    s1, t1 = ticks()
    return 100.0 * (s1 - s0) / max(1, t1 - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ids", nargs="+")
    ap.add_argument("--accept", type=int, default=2)
    ap.add_argument("--gate", type=float, default=0.5)
    ap.add_argument("--probe", type=float, default=10.0)
    ap.add_argument("--max-tries", type=int, default=8)
    args = ap.parse_args()

    q = entry.queries()
    spark = get_spark(app_name="mdls-quiet")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    registry.table(spark, sf_dir, "region").count()

    for name in args.ids:
        # one unmeasured warm rep (JIT, page cache, shared caches)
        q[name](spark, sf_dir).count()
        accepted: list[float] = []
        tries = 0
        while len(accepted) < args.accept and tries < args.max_tries:
            tries += 1
            p = steal_over(args.probe)
            if p > args.gate:
                print(f"{name}: probe steal {p:.2f}% — wait", flush=True)
                continue
            s0, t0 = ticks()
            t = time.perf_counter()
            q[name](spark, sf_dir).count()
            dt = time.perf_counter() - t
            s1, t1 = ticks()
            st = 100.0 * (s1 - s0) / max(1, t1 - t0)
            ok = st <= args.gate
            if ok:
                accepted.append(dt)
            print(
                f"{name}: rep {dt:.3f}s steal {st:.2f}% "
                f"{'ACCEPT' if ok else 'reject'}",
                flush=True,
            )
        best = min(accepted) if accepted else None
        print(f"QUIET {name}: min={best} accepted={accepted}", flush=True)


if __name__ == "__main__":
    main()
