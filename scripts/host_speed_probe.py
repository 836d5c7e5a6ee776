"""Fixed single-core + all-core CPU microbenchmark — a host-speed
anchor recorded alongside bench runs so same-tree wall-clock drift on
this virtualized host (documented ±15-20% across hours) is
attributable: if the probe moves with the bench total, the drift is
the host, not the tree.  Pure-Python integer work, no Spark.

Usage: python scripts/host_speed_probe.py  ->  one JSON line
"""
import json
import time
from concurrent.futures import ThreadPoolExecutor


def _spin(n: int) -> int:
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + 12345 + i) & 0x7FFFFFFF
    return acc


def probe() -> dict:
    """One probe reading as a dict — importable by bench.py so every
    bench record carries its own host-speed calibration (the r16
    verdict's ask: wall-clock across host windows is only comparable
    when each record says how fast its window was)."""
    N = 20_000_000
    t0 = time.time()
    _spin(N)
    single = time.time() - t0
    # GIL serializes threads; this measures scheduler/oversubscription
    # drag rather than parallel throughput, which is what we want: a
    # noisy-neighbor host shows up here first.
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(_spin, [N // 8] * 8))
    threaded = time.time() - t0
    return {"single_sec": round(single, 3),
            "threaded8_sec": round(threaded, 3),
            "mops": round(N / single / 1e6, 1)}


def main() -> None:
    print(json.dumps(probe()))


if __name__ == "__main__":
    main()
