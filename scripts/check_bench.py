"""Machine check of the 2x bench gate: parse every `| query | sec |`
table row in BASELINE.md (file order, LAST row for a name wins — that
is how re-points work), compare a bench record against it, and report
every query over threshold plus every benched query with NO baseline
row (the r9/r10 blind-spot finding — a missing row means the gate
cannot see a regression).

Usage:
  python scripts/check_bench.py [BENCH_FULL.json] [--threshold 2.0]

Reads BENCH_FULL.json (bench.py writes it on every run) by default.
Exit 1 if any query exceeds threshold x baseline or lacks a row.
Host noise note: BASELINE.md's r4 note documents a ~1.4x single-run
noise band at sf0.1 — the 2x gate is sized to absorb it; judge
anything between 1.4x and 2x by re-running the query solo.
"""

from __future__ import annotations

import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)


def baseline_rows(md_path: str | None = None) -> dict[str, float]:
    """name -> sec from BASELINE.md's tables; later rows override."""
    path = md_path or os.path.join(_REPO, "BASELINE.md")
    rows: dict[str, float] = {}
    for ln in open(path):
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)"
                     r"(?:\s*\(warm\))?\s*\|", ln)
        if m:
            rows[m.group(1)] = float(m.group(2))
    return rows


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a \
                else float(sys.argv[sys.argv.index(a) + 1])
    bench_path = args[0] if args else os.path.join(_REPO,
                                                   "BENCH_FULL.json")
    bench = json.load(open(bench_path))
    timings = bench["queries"] if "queries" in bench else bench
    base = baseline_rows()
    ok = True
    missing, over = [], []
    for q, sec in sorted(timings.items()):
        b = base.get(q)
        if b is None:
            missing.append(q)
            continue
        ratio = sec / b if b else float("inf")
        flag = ""
        if ratio > thr:
            over.append((q, sec, b, ratio))
            flag = f"  <-- OVER {thr}x"
            ok = False
        if ratio > 1.4 or flag:
            print(f"{q:32s} {sec:7.2f}s vs {b:7.2f}s = "
                  f"{ratio:4.2f}x{flag}")
    if missing:
        ok = False
        print(f"\nNO BASELINE ROW ({len(missing)}): "
              + ", ".join(missing))
        print("anchor their first recordings in BASELINE.md — the "
              "gate is blind to them until then")
    tot_b = sum(base[q] for q in timings if q in base)
    tot = sum(s for q, s in timings.items() if q in base)
    if tot_b:
        print(f"\naggregate over {sum(1 for q in timings if q in base)}"
              f" covered queries: {tot:.1f}s vs {tot_b:.1f}s baseline"
              f" = {tot / tot_b:.2f}x")
    print("OK" if ok else "BENCH GATE VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
