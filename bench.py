#!/usr/bin/env python
"""Benchmark harness: run the registry's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a noop sink (full execution, no driver
collect). A tiny warmup first touches the session so JVM/codegen startup
isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from vectordbfaiss_spark import registry
    from vectordbfaiss_spark.session import get_spark

    spark = get_spark(app_name="vectordbfaiss-bench")

    # warmup: JVM + parquet reader + Python/Arrow worker spin-up, not billed
    # (workers are long-lived per session; billing their one-time fork to
    # whichever pandas query happens to run first would misattribute it)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql import functions as F, types as T  # noqa: PLC0415

    _warm = F.pandas_udf(lambda s: s, T.LongType())
    spark.range(64).select(_warm("id")).count()

    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    wanted = set(subset.split(",")) if subset else None

    timings: dict[str, float] = {}
    for name, fn in sorted(registry.queries().items()):
        if wanted is not None and name not in wanted:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "registry_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
