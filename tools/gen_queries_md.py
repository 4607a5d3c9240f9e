#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry.

Run from the repo root after adding/renaming queries:

    python tools/gen_queries_md.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _driver_ledger() -> dict[str, str]:
    """Per-query driver-verification status from the CORRECTNESS_r*.json
    artifacts: 'rN' = hash-verified in round N (earliest), 'rows rN' =
    driver executed it as a declared rows-only entry, '' = never sampled
    by the driver gate (covered by the local pytest oracle sweep only)."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ledger: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = "r" + re.search(r"_r0*(\d+)\.json$", path).group(1)
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match"):
                prev = ledger.get(name, "")
                if not prev or prev.startswith("rows"):
                    ledger[name] = rnd
            elif row.get("err") == "no_oracle" and name not in ledger:
                ledger[name] = f"rows {rnd}"
    return ledger


def render() -> str:
    from vectordbfaiss_spark import registry

    q = registry.queries()
    oracles = registry.oracle_sql()
    ledger = _driver_ledger()
    n_driver = sum(1 for s in ledger.values() if not s.startswith("rows"))
    lines = [
        "# QUERIES — the full registry (auto-generated manifest)",
        "",
        f"{len(q)} queries: {len(oracles)} DuckDB-oracle hash-checked, "
        f"{len(registry.ROWS_ONLY)} rows-only (ANN family, recall-tested).",
        f"Driver ledger: {n_driver} hash-verified by the grading driver "
        f"(earliest round shown), {len(ledger) - n_driver} executed rows-only; "
        "the rest are covered by the local pytest oracle sweep "
        "(`tests/test_registry_oracle.py`) pending window rotation.",
        "Grouped by defining module, in registry order (the correctness gate",
        "samples a prefix of this order — see `registry._PRIORITY`).",
        "Regenerate with `python tools/gen_queries_md.py`.",
        "",
    ]
    by_mod: dict[str, list[tuple[str, str, str, str]]] = {}
    for name, fn in q.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        doc = (inspect.getdoc(fn) or "").split("\n")[0].rstrip(".")
        kind = "oracle" if name in oracles else "rows-only"
        by_mod.setdefault(mod, []).append((name, kind, ledger.get(name, "—"), doc))
    for mod in sorted(by_mod):
        lines += [
            f"## {mod}",
            "",
            "| query | check | driver | what it does |",
            "|---|---|---|---|",
        ]
        for name, kind, drv, doc in by_mod[mod]:
            lines.append(
                f"| `{name}` | {kind} | {drv} | {doc.replace('|', chr(92) + '|')} |"
            )
        lines.append("")
    return "\n".join(lines)


def main() -> None:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"
    )
    with open(out, "w") as fh:
        fh.write(render())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
