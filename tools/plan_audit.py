"""Physical-plan audit over the registered query surface.

Builds every batch query's DataFrame (no execution beyond what plan
construction itself requires) and scans the executed-plan string for
patterns that do not survive a 100 TB scale-up:

- ``CartesianProduct``: an unconditional cross join — always a bug here.
- ``BatchEvalPython``: row-at-a-time Python UDF in the plan — the slow
  path; Pandas/Arrow variants (ArrowEvalPython, FlatMapGroupsInPandas,
  MapInPandas) are the sanctioned Python boundary.
- partition-less ``Window`` (its child exchange is ``SinglePartition``):
  the whole input lands on ONE task. A SinglePartition exchange feeding
  a scalar aggregate or a final LIMIT is fine and not flagged.

Streaming queries and queries that materialize state during construction
are skipped (listed explicitly, with the reason).

Usage: python tools/plan_audit.py [sf_dir]  — exits 1 on hard flags.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# construction executes a stream or writes tables — not plan-auditable
SKIP = {
    "q15_cdc_count_parity": "builds+mutates CDC tables during construction",
    "q31_streaming_tumbling": "streaming query (runs on construction)",
    "q35_streaming_first_per_key": "streaming query (runs on construction)",
    "q58_streaming_sessions": "streaming query (runs on construction)",
    "q71_stream_stream_join": "streaming query (runs on construction)",
    "q84_stream_enrich": "streaming query (runs on construction)",
    "q14_ddl_replay": "applies DDL to a scratch table during construction",
}

# SinglePartition windows that are provably bounded (documented): the
# window input is top-k or |partitions|-sized, never the corpus.
# EMPTY since round 9: q77/q80 pin small_bytes=0 (always the distributed
# ordering path) and q78's LIMIT-50 cumsum became a rank + broadcast
# triangle join — no registered query carries a partition-less window.
BOUNDED_WINDOW_OK: dict[str, str] = {}


def audit_plan(plan: str) -> dict[str, int]:
    flags: dict[str, int] = {}
    if "CartesianProduct" in plan:
        flags["cartesian_product"] = plan.count("CartesianProduct")
    if "BatchEvalPython" in plan:
        flags["row_python_udf"] = plan.count("BatchEvalPython")
    # partition-less window: a Window node whose SUBTREE contains
    # Exchange SinglePartition before the tree returns to the window's
    # depth. Depth = length of the tree-art prefix (spaces, ':', '|',
    # '+-'), which is what encodes nesting in Spark's plan strings —
    # the codegen '*(N)' tag is excluded on purpose.
    def tree_depth(line: str) -> int:
        return len(re.match(r"^[\s:|+\-]*", line).group(0))

    node = re.compile(r"^[\s:|+\-]*(?:\*\(\d+\)\s*)?Window(?:GroupLimit)? ")
    lines = plan.splitlines()
    n_windows = 0
    for i, line in enumerate(lines):
        if not node.match(line):
            continue
        depth = tree_depth(line)
        for nxt in lines[i + 1 :]:
            if not nxt.strip():
                break
            if tree_depth(nxt) <= depth:
                break  # left the window's subtree
            if "Exchange SinglePartition" in nxt:
                n_windows += 1
                break
    if n_windows:
        flags["single_partition_window"] = n_windows
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry_mod
    from synch_spark.session import get_spark

    spark = get_spark("plan-audit")
    hard = 0
    for name, fn in sorted(entry_mod.queries().items()):
        if name in SKIP:
            print(f"SKIP {name}: {SKIP[name]}")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {str(e).splitlines()[0][:160]}")
            hard += 1
            continue
        flags = audit_plan(plan)
        if "single_partition_window" in flags and name in BOUNDED_WINDOW_OK:
            del flags["single_partition_window"]
            flags["bounded_window_ok"] = 1
        hardset = {"cartesian_product", "row_python_udf", "single_partition_window"}
        level = "FLAG" if hardset & flags.keys() else "ok"
        if level == "FLAG":
            hard += 1
            print(f"FLAG {name}: {flags}")
        elif flags:
            print(f"ok   {name}: {flags}")
    print(f"\n{'CLEAN' if hard == 0 else f'{hard} flagged'}")
    sys.exit(1 if hard else 0)


if __name__ == "__main__":
    main()
