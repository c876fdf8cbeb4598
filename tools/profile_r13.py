"""Per-query profiling for the r13 optimization round (guide §1).

For each named query: time construct (operator invocation) and run (noop
sink) separately, and count the Spark jobs/stages/tasks each phase
launched — the overhead-shape numbers the bench's wall-clock hides.

Usage: python tools/profile_r13.py [--runs N] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from qvarn_mr_spark.session import get_spark  # noqa: E402


def snap(sc):
    t = sc.statusTracker()
    jobs = t.getJobIdsForGroup(None) or []
    return set(jobs)


def main():
    args = sys.argv[1:]
    runs = 1
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-r13")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    # job counting via the status tracker: every job launched in this
    # app is visible through getJobIdsForGroup(None) when no group is
    # set; we diff the id set around each phase.
    out = {}
    for name in args:
        best = None
        for _ in range(runs):
            for rdd in sc._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
            sc._jvm.System.gc()
            sc.setJobGroup(f"prof-{name}", name)
            j0 = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            j1 = sc._jsc.sc().dagScheduler().nextJobId()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = sc._jsc.sc().dagScheduler().nextJobId()
            rec = {"construct_s": round(t1 - t0, 3),
                   "run_s": round(t2 - t1, 3),
                   "construct_jobs": j1 - j0,
                   "run_jobs": j2 - j1}
            if best is None or rec["construct_s"] + rec["run_s"] < \
                    best["construct_s"] + best["run_s"]:
                best = rec
        out[name] = best
        print(f"{name:35s} c={best['construct_s']:7.2f}s "
              f"({best['construct_jobs']:3d} jobs)  "
              f"r={best['run_s']:7.2f}s ({best['run_jobs']:3d} jobs)",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
