"""Per-repeat timing probe: prints r1, r2, ... for each query so
compile/first-run overhead is visible separately from steady-state
execution (guide §1 — know WHAT you are measuring).  Usage:

  python scripts/repeat_probe.py name [name ...] [--repeats 3]
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names, repeats = [], 3
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    import bench
    import __spark_entry__ as E

    spark = bench._new_session()
    qs = E.queries()
    bench._warm_session(spark, qs)
    for name in names:
        fn = qs[name]
        if name in bench.PY_WRITE_WARMUP:
            fn(spark, SF_DIR).count()
            spark.catalog.clearCache()
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            ts.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"REPEATS {name}: {ts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
