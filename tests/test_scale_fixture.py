"""The 10x scale-fixture generator (tools/gen_scale_fixture.py) must
produce an FK-consistent, deterministic replica — otherwise the scale
spot-check's ratios measure broken joins, not the engine. DuckDB-only:
no Spark session needed."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen(out: str) -> None:
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_scale_fixture.py"), SRC, out],
        check=True,
        capture_output=True,
        timeout=300,
    )


def test_scale_fixture_fk_consistent_and_deterministic(tmp_path):
    out = str(tmp_path / "x10")
    _gen(out)
    con = duckdb.connect()

    # 10x rows on scaling tables, dims fixed
    for t, factor in [
        ("lineitem", 10), ("orders", 10), ("customer", 10), ("events", 10),
        ("documents", 10), ("embeddings", 10), ("nation", 1), ("region", 1),
    ]:
        n_src = con.sql(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_out = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        assert n_out == factor * n_src, (t, n_src, n_out)

    # referential integrity holds across the replication: every FK
    # resolves (keys were shifted by the same stride on both sides)
    for fk_col, fk_t, pk_col, pk_t in [
        ("o_custkey", "orders", "c_custkey", "customer"),
        ("l_orderkey", "lineitem", "o_orderkey", "orders"),
        ("l_suppkey", "lineitem", "s_suppkey", "supplier"),
        ("l_partkey", "lineitem", "p_partkey", "part"),
    ]:
        orphans = con.sql(f"""
            SELECT count(*) FROM '{out}/{fk_t}.parquet' f
            WHERE {fk_col} NOT IN (
              SELECT {pk_col} FROM '{out}/{pk_t}.parquet')
        """).fetchone()[0]
        assert orphans == 0, (fk_col, orphans)

    # id structure scales exactly: distinct key count is 10x the source's
    # (disjoint per-copy ranges — the source's own duplicate multiplicity,
    # e.g. repeated (l_orderkey, l_linenumber) pairs, is preserved, not
    # amplified across copies)
    for t, k in [("lineitem", "(l_orderkey, l_linenumber)"),
                 ("orders", "o_orderkey"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")]:
        nd_src = con.sql(
            f"SELECT count(DISTINCT {k}) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        nd_out = con.sql(
            f"SELECT count(DISTINCT {k}) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        assert nd_out == 10 * nd_src, (t, nd_src, nd_out)

    # copy 0 is byte-identical content for documents (bounded probes see
    # the original corpus), and copies are distinct (no exact dup storm)
    same = con.sql(f"""
        SELECT count(*) FROM '{SRC}/documents.parquet' s
        JOIN '{out}/documents.parquet' o USING (doc_id)
        WHERE s.text IS DISTINCT FROM o.text
    """).fetchone()[0]
    assert same == 0
    n_texts, n_distinct = con.sql(
        f"SELECT count(*), count(DISTINCT text) FROM '{out}/documents.parquet'"
    ).fetchone()
    src_distinct = con.sql(
        f"SELECT count(DISTINCT text) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    assert n_distinct >= 9 * src_distinct  # perturbed copies stay distinct

    # determinism: a second generation is byte-stable at the query level
    out2 = str(tmp_path / "x10b")
    _gen(out2)
    for t in ("lineitem", "documents", "embeddings"):
        diff = con.sql(f"""
            SELECT count(*) FROM (
              (SELECT * FROM '{out}/{t}.parquet'
               EXCEPT SELECT * FROM '{out2}/{t}.parquet')
              UNION ALL
              (SELECT * FROM '{out2}/{t}.parquet'
               EXCEPT SELECT * FROM '{out}/{t}.parquet')
            )
        """).fetchone()[0]
        assert diff == 0, (t, diff)
