#!/usr/bin/env python
"""Capture `.explain("formatted")` output (and optionally job counts +
noop-sink wall) for named registry queries — the evidence files the
optimization rounds commit under plans/r{N}/.

Usage:
  python tools/capture_plans.py --sf /root/testdata/sf0.1 \
      --out plans/r10 --suffix before --names q1,q2 [--time]

NOT a benchmark: wall numbers here are one-shot session walls for
job-count context; the comparable record is bench.py's.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--names", required=True)
    ap.add_argument("--time", action="store_true", help="also run noop sink, count jobs")
    args = ap.parse_args()

    from vectordbfaiss_spark import registry
    from vectordbfaiss_spark.session import get_spark

    spark = get_spark(app_name="capture-plans", driver_memory="8g")
    os.makedirs(args.out, exist_ok=True)
    names = [n for n in args.names.split(",") if n]
    qs = registry.queries()
    for name in names:
        fn = qs[name]
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        extra = ""
        if args.time:
            tracker = spark.sparkContext.statusTracker()
            group = f"plancap-{name}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            njobs = len(tracker.getJobIdsForGroup(group))
            extra = f"\n-- noop wall: {dt:.3f}s  spark jobs: {njobs}\n"
            print(f"{name}: {dt:.3f}s {njobs} jobs")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan + extra)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
