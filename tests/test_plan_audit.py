"""audit_plan: the plan-string red-flag scanner used by tools/plan_audit."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_audit import audit_plan


def test_flags_cartesian_and_row_python():
    plan = """*(3) Project [a#1]
+- CartesianProduct
   :- BatchEvalPython [f(a#1)], [pythonUDF0#9]
   +- Scan parquet [b#2]
"""
    flags = audit_plan(plan)
    assert flags["cartesian_product"] == 1
    assert flags["row_python_udf"] == 1


def test_flags_partitionless_window():
    plan = """Window [row_number() windowspecdefinition(x#1 ASC)], [x#1 ASC]
+- Sort [x#1 ASC], false, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS
      +- Scan parquet [x#1]
"""
    assert audit_plan(plan) == {"single_partition_window": 1}


def test_partitioned_window_not_flagged():
    plan = """Window [sum(v#2) windowspecdefinition(k#1)], [k#1]
+- Sort [k#1 ASC], false, 0
   +- Exchange hashpartitioning(k#1, 32), ENSURE_REQUIREMENTS
      +- Scan parquet [k#1, v#2]
"""
    assert audit_plan(plan) == {}


def test_scalar_agg_single_partition_not_flagged():
    # SinglePartition feeding a final aggregate (no Window) is legitimate
    plan = """HashAggregate(keys=[], functions=[sum(v#2)])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS
   +- HashAggregate(keys=[], functions=[partial_sum(v#2)])
      +- Scan parquet [v#2]
"""
    assert audit_plan(plan) == {}


def test_window_with_sibling_single_partition_not_flagged():
    # the SinglePartition belongs to a SIBLING subtree at lower depth,
    # not to the window's child — must not flag
    plan = """Union
:- Window [rank() windowspecdefinition(k#1)], [k#1]
:  +- Exchange hashpartitioning(k#1, 32)
:     +- Scan parquet [k#1]
+- Exchange SinglePartition
   +- HashAggregate(keys=[], functions=[count(1)])
"""
    assert audit_plan(plan) == {}


def test_arrow_python_not_flagged():
    plan = """ArrowEvalPython [f(a#1)], [r#5], 200
+- FlatMapGroupsInPandas [k#1], g(...), [out#7]
   +- Scan parquet [k#1, a#1]
"""
    assert audit_plan(plan) == {}
