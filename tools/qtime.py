"""Min-over-repeats timing for individual declared queries.

Usage: python tools/qtime.py q20_jaccard_pairs,q96_split_leakage [repeats] [sf_dir]

Runs each named query serially `repeats` times (default 3) in one
bench-identical session (same collect() methodology as bench.py) and
prints min/median per query. Min-over-repeats is the noise-robust
instrument on this host: ambient CPU steal only ever inflates a run,
so the minimum is the best estimate of the tree's true cost.
A calibration probe (bench._calibrate) brackets the run so drift is
visible in the output.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry_mod
    from bench import _calibrate
    from synch_spark.session import get_spark

    spark = get_spark("qtime")
    spark.range(1).count()
    _calibrate(spark)  # one-time codegen warm
    queries = entry_mod.queries()
    pre = _calibrate(spark)
    print(f"calib pre: {pre}", flush=True)
    for name in names:
        fn = queries[name]
        ts = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: min={min(ts):.3f} med={statistics.median(ts):.3f} "
              f"all={[round(t, 3) for t in ts]}", flush=True)
    post = _calibrate(spark)
    print(f"calib post: {post}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
