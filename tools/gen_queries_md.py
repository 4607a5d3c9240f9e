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


def render() -> str:
    from vectordbfaiss_spark import registry

    q = registry.queries()
    oracles = registry.oracle_sql()
    lines = [
        "# QUERIES — the full registry (auto-generated manifest)",
        "",
        f"{len(q)} queries: {len(oracles)} DuckDB-oracle hash-checked, "
        f"{len(registry.ROWS_ONLY)} rows-only (ANN family, recall-tested).",
        "Grouped by defining module, in registry order (the correctness gate",
        "samples a prefix of this order — see `registry._PRIORITY`).",
        "Regenerate with `python tools/gen_queries_md.py`.",
        "",
    ]
    by_mod: dict[str, list[tuple[str, str, str]]] = {}
    for name, fn in q.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        doc = (inspect.getdoc(fn) or "").split("\n")[0].rstrip(".")
        kind = "oracle" if name in oracles else "rows-only"
        by_mod.setdefault(mod, []).append((name, kind, doc))
    for mod in sorted(by_mod):
        lines += [f"## {mod}", "", "| query | check | what it does |", "|---|---|---|"]
        for name, kind, doc in by_mod[mod]:
            lines.append(f"| `{name}` | {kind} | {doc.replace('|', chr(92) + '|')} |")
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
