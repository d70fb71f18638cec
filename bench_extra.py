#!/usr/bin/env python
"""Round-8 measurement harness (bench.py is FROZEN for the driver; this
file holds the extra instrumentation the optimization guide §1 asks
for): per-query noop-sink timings with labelled jobs, plus
`.explain("formatted")` capture into plans/r08/.

Usage::

    python bench_extra.py                    # all bench queries, 2 reps
    python bench_extra.py --queries a,b,c    # subset
    python bench_extra.py --reps 3
    python bench_extra.py --plans-only       # no timing, just explain()
    python bench_extra.py --tag after        # plans/r08/<q>_after.txt

Prints one JSON line {"queries": {name: best_sec}} at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod

    names = ([q.strip() for q in args.queries.split(",") if q.strip()]
             or list(bench.BENCH_QUERIES))
    qmap = entrymod.queries()
    spark = bench.make_spark(CPUS, "bench-extra")
    plans_dir = os.path.join(HERE, "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)
    try:
        # same warmup as bench.py main_bench
        from matrixprofile_spark.operators.profile import mpx_profiles, pack_series
        warm = pack_series(bench.synth_long_series(spark, CPUS * 2, 256))
        bench.force(mpx_profiles(warm.repartition(CPUS, "conv_id"), 16,
                                 packed=True))
        bench.force(qmap["rollup_1m"](spark, SF_DIR).limit(1))

        timings: dict[str, float] = {}
        for name in names:
            df = qmap[name](spark, SF_DIR)
            if not args.no_plans:
                path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
                with open(path, "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            if args.plans_only:
                continue
            best = None
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"extra:{name}")
                t0 = time.time()
                bench.force(qmap[name](spark, SF_DIR))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
            timings[name] = round(best, 3)
            print(f"{name}: {timings[name]}s", file=sys.stderr, flush=True)
        print(json.dumps({"queries": timings, "sf_dir": SF_DIR,
                          "reps": args.reps}), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
