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

Output: .scratch/sf1.0/{documents,embeddings}.parquet (gitignored;
regenerate any time — fully deterministic). Only the tables the headline
spot-check queries read are scaled.

Usage: python tools/gen_scale_fixture.py [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000
COPIES = 10


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".scratch", "sf1.0")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT doc_id + c * {STRIDE} AS doc_id,
                 CASE WHEN c = 0 THEN text ELSE 'c' || c || ' ' || text END AS text,
                 lang, source,
                 CASE WHEN c = 0 THEN n_chars
                      ELSE length('c' || c || ' ' || text) END AS n_chars
          FROM '{src}/documents.parquet', range({COPIES}) t(c)
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
          FROM '{src}/embeddings.parquet', range({COPIES}) t(c)
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ("documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{out}/{t}.parquet: {n} rows")


if __name__ == "__main__":
    main()
