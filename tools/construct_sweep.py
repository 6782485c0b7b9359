"""Construction-only cost sweep: time fn(spark, sf_dir) WITHOUT collect().

Usage: python tools/construct_sweep.py [repeats] [sf_dir] [only_csv]

Measures the driver-side cost of building each declared query's plan —
py4j round trips, JVM analysis, and any construction-time jobs (eager
materializations) — separately from execution. Two passes per query:
the FIRST construction in a session (cold: codegen/analysis caches
empty, `_t`/`_spread` memos empty) and the min over `repeats` repeat
constructions (warm: what the bench's second drain attempt pays).
Prints a table sorted by cold cost and a JSON map on the last line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    import __spark_entry__ as entry_mod
    from bench import _calibrate
    from synch_spark.session import get_spark

    spark = get_spark("construct-sweep")
    spark.range(1).count()
    _calibrate(spark)
    pre = _calibrate(spark)
    print(f"calib pre: {pre}", flush=True)

    queries = entry_mod.queries()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"construct:{name}")
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {e}", flush=True)
            continue
        cold[name] = time.perf_counter() - t0
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            ts.append(time.perf_counter() - t0)
        warm[name] = min(ts)
    post = _calibrate(spark)
    print(f"calib post: {post}", flush=True)
    print(f"{'query':44s} {'cold_s':>8s} {'warm_s':>8s}")
    for name in sorted(cold, key=lambda k: -cold[k]):
        print(f"{name:44s} {cold[name]:8.3f} {warm[name]:8.3f}")
    print(f"TOTAL cold={sum(cold.values()):.1f}s "
          f"warm={sum(warm.values()):.1f}s n={len(cold)}", flush=True)
    print(json.dumps({"cold": {k: round(v, 4) for k, v in cold.items()},
                      "warm": {k: round(v, 4) for k, v in warm.items()}}))


if __name__ == "__main__":
    main()
