"""Unit tests for tools/plan_smells.py's plan-text classifier.

The sweep tool is only as good as its pattern matching, and the two
window spellings are easy to confuse: a partitionBy-with-no-orderBy
window and an orderBy-only window BOTH print two bracket groups on the
Window node; only the presence of ASC/DESC entries in the
windowspecdefinition separates them. These fixtures are verbatim shapes
from real executed plans at sf0.001.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "plan_smells",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "plan_smells.py",
    ),
)
plan_smells = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_smells)


_GLOBAL_RANK_BOUNDED = """\
AdaptiveSparkPlan isFinalPlan=false
+- Project [doc_id#0L, bm25#49, cast(rnk#53 as bigint) AS rnk#55L]
   +- Filter (rnk#53 <= 10)
      +- Window [row_number() windowspecdefinition(bm25#49 DESC NULLS LAST, doc_id#0L ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS rnk#53], [bm25#49 DESC NULLS LAST, doc_id#0L ASC NULLS FIRST]
         +- TakeOrderedAndProject(limit=10, orderBy=[bm25#49 DESC NULLS LAST,doc_id#0L ASC NULLS FIRST], output=[doc_id#0L,bm25#49])
            +- HashAggregate(keys=[doc_id#0L], functions=[sum(contrib#48)], output=[doc_id#0L, bm25#49])
"""

_GLOBAL_RANK_UNBOUNDED = """\
AdaptiveSparkPlan isFinalPlan=false
+- Filter (rnk#53L <= 10)
   +- Window [cast(row_number() as bigint) windowspecdefinition(bm25#49 DESC NULLS LAST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS rnk#53L], [bm25#49 DESC NULLS LAST]
      +- Sort [bm25#49 DESC NULLS LAST], false, 0
         +- HashAggregate(keys=[doc_id#0L], functions=[sum(contrib#48)], output=[doc_id#0L, bm25#49])
"""

_PARTITION_ONLY = """\
AdaptiveSparkPlan isFinalPlan=false
+- Window [count(1) windowspecdefinition(doc_id#1843L, specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS n#1850L], [doc_id#1843L]
   +- Sort [doc_id#1843L ASC NULLS FIRST], false, 0
      +- Exchange hashpartitioning(doc_id#1843L, 8), ENSURE_REQUIREMENTS, [plan_id=1]
"""

_PARTITIONED_ORDERED = """\
AdaptiveSparkPlan isFinalPlan=false
+- Window [sum(neg#2L) windowspecdefinition(bkt#16, s#0 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)) AS _we0#30L], [bkt#16], [s#0 ASC NULLS FIRST]
   +- Sort [bkt#16 ASC NULLS FIRST, s#0 ASC NULLS FIRST], false, 0
"""

_FILTER_ON_SCAN_UNPUSHED = """\
AdaptiveSparkPlan isFinalPlan=false
+- Filter (cast(doc_id#0L as string) = 7)
   +- FileScan parquet [doc_id#0L,text#1] Batched: true, DataFilters: [], Format: Parquet, PushedFilters: [], ReadSchema: struct<doc_id:bigint>
"""

_FILTER_NULL_GUARD_ONLY = """\
AdaptiveSparkPlan isFinalPlan=false
+- Filter isnotnull(doc_id#0L)
   +- FileScan parquet [doc_id#0L] Batched: true, DataFilters: [], Format: Parquet, PushedFilters: [], ReadSchema: struct<doc_id:bigint>
"""


def test_bounded_global_rank_window_is_flagged_as_bounded():
    found = plan_smells.analyze(_GLOBAL_RANK_BOUNDED)
    (hit,) = found["unpartitioned_window"]
    assert hit["bounded_below"] is True


def test_unbounded_global_window_is_flagged_unbounded():
    found = plan_smells.analyze(_GLOBAL_RANK_UNBOUNDED)
    (hit,) = found["unpartitioned_window"]
    assert hit["bounded_below"] is False


def test_partition_only_window_is_not_flagged():
    assert "unpartitioned_window" not in plan_smells.analyze(_PARTITION_ONLY)


def test_partitioned_ordered_window_is_not_flagged():
    assert "unpartitioned_window" not in plan_smells.analyze(
        _PARTITIONED_ORDERED
    )


def test_unpushed_comparison_filter_on_scan_is_flagged():
    found = plan_smells.analyze(_FILTER_ON_SCAN_UNPUSHED)
    assert found["filter_not_pushed"]


def test_null_guard_only_filter_is_ignored():
    assert "filter_not_pushed" not in plan_smells.analyze(
        _FILTER_NULL_GUARD_ONLY
    )
