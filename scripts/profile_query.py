"""Per-query profiler for the optimization rounds (guide §1):

  python scripts/profile_query.py name [name ...] [--plans DIR]
      [--repeats 2] [--sf DIR] [--suffix before]

For each query: fresh warm session (bench.py's exact session conf),
run the query with the bench's count() action `repeats` times
(best-of), record wall seconds, the Spark job/stage count consumed by
the run (status-tracker delta), and write `.explain("formatted")` to
DIR/<name>_<suffix>.txt.  Prints one summary line per query.

This script is measurement tooling only — it never changes what a
query computes.
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    repeats = 2
    suffix = "before"
    names = []
    sf_dir = SF_DIR
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    import bench
    import __spark_entry__ as E

    spark = bench._new_session()
    qs = E.queries()
    bench._warm_session(spark, qs)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in names:
        fn = qs[name]
        sc.setJobDescription(f"profile:{name}")
        if name in bench.PY_WRITE_WARMUP:
            fn(spark, sf_dir).count()
            spark.catalog.clearCache()
        jobs0 = tracker.getJobIdsForGroup(None)
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        # job count for ONE run = delta / repeats (integer-ish)
        jobs1 = tracker.getJobIdsForGroup(None)
        njobs = (len(jobs1) - len(jobs0)) / max(repeats, 1)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir,
                                   f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        print(f"PROFILE {name}: best={best:.3f}s rows={n} "
              f"jobs/run~{njobs:.1f}")
        sc.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
