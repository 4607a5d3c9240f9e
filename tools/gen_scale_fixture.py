#!/usr/bin/env python
"""Generate a 10x scale fixture (sf1.0-equivalent) for the scale
spot-check by deterministic replication of the driver's sf0.1 tables.

The driver only ships sf{0.001,0.01,0.1} (TESTDATA.md); every scale claim
in SCALE.md was argued from sf0.1, so this builds a 10x step locally:
each source row is emitted 10 times with a disjoint id range per copy
(stride 10^7 >> any fixture id) and a deterministic per-copy content
perturbation, so dedup/shingle/ANN workloads don't degenerate into
10-way exact duplicates:

- documents: copy 0 is byte-identical to the source (bounded probes like
  doc_id < 300 still see the original rows); copies 1-9 prefix "c{c} "
  to the text and recompute n_chars.
- embeddings: copy 0 identical; copies 1-9 nudge element 1 by c*0.001
  (queries l2-normalize, so this keeps vectors distinct but
  near-duplicate — the hard case for ANN routing).
- TPC-H star: region/nation stay fixed (true dims don't scale);
  customer/supplier/part/orders/lineitem replicate with EVERY key
  column (primary + foreign) shifted by the same per-copy stride, so
  referential integrity holds within each copy and join fan-outs match
  the original's — groups keyed on non-id columns (returnflag, brand,
  priority) keep their cardinality and get 10x rows each, which is how
  real TPC-H scaling behaves.
- events: event_id/user_id shifted; timestamps unchanged (each copy is
  a disjoint user population over the same time range, so sessionize/
  window workloads scale by population, not by frame length).

Output: .scratch/sf1.0/*.parquet (gitignored; regenerate any time —
fully deterministic).

Usage: python tools/gen_scale_fixture.py [src_dir] [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".scratch", "sf1.0")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT doc_id + c * {STRIDE} AS doc_id,
                 CASE WHEN c = 0 THEN text ELSE 'c' || c || ' ' || text END AS text,
                 lang, source,
                 CASE WHEN c = 0 THEN n_chars
                      ELSE length('c' || c || ' ' || text) END AS n_chars
          FROM '{src}/documents.parquet', range({copies}) t(c)
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
        COPY (
          SELECT vec_id + c * {STRIDE} AS vec_id,
                 CASE WHEN c = 0 THEN embedding
                      ELSE list_concat(
                        [CAST(embedding[1] + c * 0.001 AS FLOAT)],
                        embedding[2:]) END AS embedding,
                 label
          FROM '{src}/embeddings.parquet', range({copies}) t(c)
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    # TPC-H star: fixed dims copied verbatim; scaling tables replicated
    # with all id columns (PK + FK) shifted by the same per-copy stride
    shifted = {
        "region": [],
        "nation": [],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for t, keys in shifted.items():
        if not keys:  # true dimension: one copy
            con.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
            continue
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
        ).fetchall()]
        sel = ", ".join(
            f"{col} + c * {STRIDE} AS {col}" if col in keys else col
            for col in cols
        )
        con.sql(f"""
            COPY (
              SELECT {sel}
              FROM '{src}/{t}.parquet', range({copies}) t(c)
              ORDER BY {keys[0]}
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
        """)
    for t in sorted(list(shifted) + ["documents", "embeddings"]):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{out}/{t}.parquet: {n} rows")


if __name__ == "__main__":
    main()
