"""Dump `.explain("formatted")` for every plan-constructible declared
query to plans/r12/<query>_<tag>.txt, plus a one-line-per-query summary
of plan shape (Exchange count, join strategies, Python-boundary nodes)
to stdout.

Usage: python tools/dump_plans_r12.py <tag> [sf_dir] [only_csv]

Streaming / state-mutating queries reuse tools/plan_audit.py's SKIP
list (their construction runs jobs; there is no stable batch plan to
print).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_audit import SKIP  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    import __spark_entry__ as entry_mod
    from synch_spark.session import get_spark

    spark = get_spark("plan-dump-r12")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    queries = entry_mod.queries()
    for name, fn in sorted(queries.items()):
        if name in SKIP:
            print(f"{name}: SKIP ({SKIP[name]})")
            continue
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — report, keep going
            print(f"{name}: ERROR {str(e).splitlines()[0][:160]}")
            continue
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        py = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas|AggregateInPandas)", plan)))
        wins = len(re.findall(r"\bWindow\b", plan))
        print(f"{name}: exchanges={n_ex} windows={wins} "
              f"joins={','.join(joins) or '-'} py={','.join(py) or '-'}")
    spark.stop()


if __name__ == "__main__":
    main()
