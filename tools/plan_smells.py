#!/usr/bin/env python
"""Structural plan-smell sweep over every registry query.

Round 4 audited one smell class (static broadcasts of corpus-grain
frames) and round 5 found another by hand (rank casts disabling window
limit pushdown). This tool makes the hunt systematic: it renders every
registry query's EXECUTED plan at a small SF and flags structural
patterns that are invisible to correctness tests but hostile at 100 TB:

- `unpartitioned_window` — a Window node with no partition spec
  (2 bracket groups instead of 3). Funnels its whole input through ONE
  task unless something upstream bounds it; the report records whether
  a TakeOrderedAndProject/WindowGroupLimit/Limit appears BELOW it in
  the same subtree, which is the bounded-by-construction exemption.
- `cartesian` — CartesianProduct anywhere.
- `bnlj` — BroadcastNestedLoopJoin; legitimate only for 1-row scalar
  crossJoins and the bloom bit-position form, so every hit is listed
  for whitelist review.
- `filter_not_pushed` — a Filter node sitting DIRECTLY on a parquet
  FileScan whose PushedFilters is empty. The classic cause is an
  expression wrapper (cast/function) on the scan column; IsNotNull-only
  filters are ignored (join-side null filters often aren't pushable).
- `sort_aggregate` — SortAggregate where a HashAggregate was expected
  (non-hashable buffer types force sort-based aggregation; usually fine
  but worth knowing at 100 TB: it adds a sort per grouping).

Usage: python tools/plan_smells.py [--sf DIR] [out_json]
Not a timing tool; no contamination rule applies.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WINDOW = re.compile(r"^[\s:+\-*]*Window\s+(\[.*)$")
_INDENT = re.compile(r"^([\s:+\-*]*)")


def _bracket_groups(rest: str) -> int:
    """Count top-level `[...]` groups on a Window line: 3 = partitioned
    (funcs, partition, order), 2 = unpartitioned (funcs, order)."""
    depth = 0
    groups = 0
    for ch in rest:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth -= 1
    return groups


def _subtree_below(lines: list[str], i: int) -> list[str]:
    """Lines that are plan children of line i (deeper indentation until
    indentation returns to <= line i's)."""
    base = len(_INDENT.match(lines[i]).group(1))
    out = []
    for ln in lines[i + 1 :]:
        ind = len(_INDENT.match(ln).group(1))
        if ln.strip() and ind <= base:
            break
        out.append(ln)
    return out


def analyze(plan: str) -> dict:
    lines = plan.splitlines()
    smells: dict[str, list] = {
        "unpartitioned_window": [],
        "cartesian": [],
        "bnlj": [],
        "filter_not_pushed": [],
        "sort_aggregate": [],
    }
    for i, ln in enumerate(lines):
        m = _WINDOW.match(ln)
        # 2 bracket groups = (funcs, X). X is the ORDER spec only when
        # the windowspecdefinition carries ASC/DESC entries; a
        # partitionBy-with-no-orderBy window also prints 2 groups (X =
        # partition cols) and is NOT a single-task funnel.
        if (
            m
            and _bracket_groups(m.group(1)) == 2
            and re.search(r" (ASC|DESC) ", m.group(1))
        ):
            below = "\n".join(_subtree_below(lines, i))
            bounded = bool(
                re.search(
                    r"TakeOrderedAndProject|WindowGroupLimit|GlobalLimit|LocalLimit",
                    below,
                )
            )
            smells["unpartitioned_window"].append(
                {"line": ln.strip()[:160], "bounded_below": bounded}
            )
        if "CartesianProduct" in ln:
            smells["cartesian"].append(ln.strip()[:160])
        if "BroadcastNestedLoopJoin" in ln:
            smells["bnlj"].append(ln.strip()[:160])
        if "SortAggregate" in ln:
            smells["sort_aggregate"].append(ln.strip()[:120])
        if re.match(r"^[\s:+\-*]*Filter\b", ln):
            # direct child scan with empty pushdown?
            sub = _subtree_below(lines, i)
            if sub:
                first = sub[0]
                if "FileScan parquet" in first and "PushedFilters: []" in first:
                    cond = ln.strip()[:200]
                    # ignore pure null-guard filters
                    stripped = re.sub(r"isnotnull\([^)]*\)", "", cond)
                    if re.search(r"[<>=]|IN \(|StartsWith|Contains|LIKE", stripped):
                        smells["filter_not_pushed"].append(cond)
    return {k: v for k, v in smells.items() if v}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--names", default=None)
    ap.add_argument("out", nargs="?", default=None)
    args = ap.parse_args()

    from vectordbfaiss_spark import registry
    from vectordbfaiss_spark.session import get_spark

    spark = get_spark(
        app_name="plan_smells", master="local[8]", shuffle_partitions=8
    )
    qs = registry.queries()
    names = (
        [n.strip() for n in args.names.split(",") if n.strip()]
        if args.names
        else list(qs)
    )
    report: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # keep sweeping
            errors[name] = str(exc)[:300]
            continue
        found = analyze(plan)
        if found:
            report[name] = found
            print(f"{name}: {sorted(found)}")
    spark.stop()

    summary = {
        "sf": args.sf,
        "n_queries": len(names),
        "n_flagged": len(report),
        "n_errors": len(errors),
        "flagged": report,
        "errors": errors,
    }
    print(
        json.dumps(
            {k: summary[k] for k in ("sf", "n_queries", "n_flagged", "n_errors")}
        )
    )
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
