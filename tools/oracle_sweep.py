#!/usr/bin/env python
"""Driver-style DuckDB oracle sweep over an arbitrary query subset at an
arbitrary SF — the pre-gate rehearsal tool.

The driver's correctness gate runs at sf0.01; the pytest sweep
(tests/test_registry_oracle.py) runs at sf0.001. Between rounds we also
want the SAME hash-style comparison at sf0.1 for the queries about to
enter the driver window, so any fixture-scale surprise (NULL placement,
tie-break instability, overflow) is found locally first.

Usage:
  python tools/oracle_sweep.py --sf /root/testdata/sf0.1 \
      [--names a,b,c | --never-sampled] [out_json]

--never-sampled selects registry queries with no row in any committed
CORRECTNESS_r*.json. Rows-only queries execute and record row counts.
This is NOT a timing tool — no contamination rule applies; do not read
its wall times as benchmarks.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def compare(mine: pd.DataFrame, orc: pd.DataFrame) -> tuple[bool, str]:
    mc = sorted(mine.columns)
    if sorted(orc.columns) != mc:
        return False, f"schema {mc} vs {sorted(orc.columns)}"
    if len(mine) != len(orc):
        return False, f"rows {len(mine)} vs {len(orc)}"
    m = mine.reindex(mc, axis=1).sort_values(mc, kind="mergesort").reset_index(drop=True)
    o = orc.reindex(mc, axis=1).sort_values(mc, kind="mergesort").reset_index(drop=True)
    for c in mc:
        if pd.api.types.is_float_dtype(m[c]) or pd.api.types.is_float_dtype(o[c]):
            if not np.allclose(
                m[c].astype(float), o[c].astype(float),
                rtol=1e-9, atol=1e-9, equal_nan=True,
            ):
                return False, f"values differ in {c}"
        elif not m[c].astype(str).equals(o[c].astype(str)):
            return False, f"values differ in {c}"
    return True, ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--names", default=None)
    ap.add_argument("--never-sampled", action="store_true")
    ap.add_argument("out", nargs="?", default=None)
    args = ap.parse_args()

    import duckdb

    from vectordbfaiss_spark import registry
    from vectordbfaiss_spark.session import get_spark

    qs = registry.queries()
    oracles = registry.oracle_sql()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    elif args.never_sampled:
        sampled: set[str] = set()
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
            with open(p) as fh:
                sampled.update(json.load(fh))
        names = [n for n in qs if n not in sampled]
    else:
        names = list(qs)
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="oracle_sweep", master="local[32]",
                      shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    results: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            mine = qs[name](spark, args.sf).toPandas()
            sql = oracles.get(name)
            if sql is None:
                results[name] = {"status": "rows_only", "rows": len(mine),
                                 "sec": round(time.time() - t0, 2)}
                print(f"{name} -> rows-only ({len(mine)} rows)")
                continue
            orc = con.sql(sql).df()
            ok, why = compare(mine, orc)
            results[name] = {"status": "MATCH" if ok else "MISMATCH",
                             "rows": len(mine), "why": why or None,
                             "sec": round(time.time() - t0, 2)}
            if not ok:
                n_bad += 1
            print(f"{name} -> {'MATCH' if ok else 'MISMATCH ' + why}")
        except Exception as exc:  # record, keep sweeping
            n_bad += 1
            results[name] = {"status": "ERROR", "why": str(exc)[:500],
                             "sec": round(time.time() - t0, 2)}
            print(f"{name} -> ERROR {str(exc)[:200]}")
    spark.stop()

    summary = {
        "sf": args.sf,
        "n": len(names),
        "n_match": sum(1 for r in results.values() if r["status"] == "MATCH"),
        "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
        "n_bad": n_bad,
        "results": results,
    }
    print(json.dumps({k: summary[k] for k in ("sf", "n", "n_match",
                                              "n_rows_only", "n_bad")}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
