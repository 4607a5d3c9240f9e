#!/usr/bin/env python
"""Plan-graduation check for the round-4 forced-broadcast audit.

The audit removed `F.broadcast` hints from scaling dims (customer /
supplier / part), post-aggregate id sets, and corpus-grain frames on the
theory that FILE STATISTICS broadcast them at small SF and graduate them
to shuffle joins once they outgrow the threshold — a forced hint can
never graduate. This tool proves the theory on plans, no timing: for
each audited query it plans against sf0.1 AND against a replicated
large fixture (tools/gen_scale_fixture.py) and reports the join-node mix
at both, flagging any plan that still builds a broadcast from a frame
that grew with the data.

Usage: python tools/graduation_check.py [big_fixture_dir]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries the audit touched whose join strategy must come from stats
QUERIES = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q14_promo_revenue_pct",
    "q16_supplier_relationship",
    "q18_large_volume_orders",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_lone_fault_supplier",
    "q2_min_cost_supplier",
    "fk_integrity_audit",
    "bloom_prefilter_join",
]

_JOINS = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin", "CartesianProduct")


def join_mix(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    c: Counter[str] = Counter()
    for line in plan.splitlines():
        m = re.match(r"^[\s:+\-*(]*(?:\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]+)", line)
        if not m:
            continue
        for j in _JOINS:
            if m.group(1).startswith(j):
                c[j] += 1
                break
    return dict(c)


def main() -> None:
    from vectordbfaiss_spark import registry
    from vectordbfaiss_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    big = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, ".scratch", "sf10")
    small = "/root/testdata/sf0.1"
    spark = get_spark(app_name="graduation-check")
    q = registry.queries()
    print(f"{'query':28s} {'sf0.1 join mix':34s} {'big-fixture join mix':34s} verdict")
    for name in QUERIES:
        a = join_mix(q[name](spark, small))
        b = join_mix(q[name](spark, big))
        graduated = a.get("BroadcastHashJoin", 0) > b.get("BroadcastHashJoin", 0) or (
            b.get("SortMergeJoin", 0) + b.get("ShuffledHashJoin", 0)
            > a.get("SortMergeJoin", 0) + a.get("ShuffledHashJoin", 0)
        )
        same = a == b
        verdict = "GRADUATED" if graduated else ("same-plan" if same else "changed")
        print(f"{name:28s} {str(a):34s} {str(b):34s} {verdict}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
