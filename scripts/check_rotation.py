"""Machine check of the registry-rotation policy (SURVEY §15).

Merges every CORRECTNESS_r*.json into a last-green-round map and
verifies, for the CURRENT `__spark_entry__.queries()` order:

1. every never-attested entry appears inside the 50-row driver window
   OR in the contiguous block immediately below it (registered after
   this round's window was fixed — next round's rotation leaders);
2. no entry OUTSIDE the window has a last green attestation older
   than (current round - 3) — the staleness invariant is about what
   the window failed to rotate in, so in-window entries are exempt
   (they re-attest when the driver runs);
3. prints the staleness histogram and the window so the rotation
   commit can be eyeballed.

Usage: python scripts/check_rotation.py <current_round>
Exit 1 on any violation.  Run BEFORE the rotation commit (§15's
recipe), not after the judge finds the gap.
"""

from __future__ import annotations

import glob
import json
import os
import re
import signal
import sys

# keep exit codes honest when piped to `head` (see make_window.py)
if hasattr(signal, "SIGPIPE"):
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
# SURVEY §15 invariant, amended r15: entries outside the window may
# be at most FOUR rounds stale (was 3 — unsatisfiable at 227 entries
# on a 50-slot window).  Compensating control: the full-registry
# local DuckDB oracle gate runs at every round close.
MAX_AGE = 4


def last_green(exclude_round: int | None = None) -> dict[str, int]:
    seen: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(
            os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        if rnd == exclude_round:
            continue
        for k, v in json.load(open(f)).items():
            if v.get("hash_match") and v.get("rows_match") \
                    and v.get("schema_match"):
                seen[k] = max(seen.get(k, 0), rnd)
    return seen


def latest_attestation() -> tuple[int | None, set[str]]:
    """(round, attested-query-names) of the newest CORRECTNESS file —
    green or red, since "the driver ran exactly this window" is what
    the close-tolerant tripwire branch needs to verify."""
    files = glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))
    if not files:
        return None, set()
    latest = max(files, key=lambda f: int(
        re.search(r"_r(\d+)\.json$", f).group(1)))
    rnd = int(re.search(r"_r(\d+)\.json$", latest).group(1))
    return rnd, set(json.load(open(latest)))


def registry_order() -> list[str]:
    # registry order without starting Spark: the literal dict keys of
    # queries(), in source order
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "__spark_entry__.py")).read()
    body = src[src.index("def queries()"):]
    body = body[:body.index("\ndef ")]
    return re.findall(r'^\s+"([a-z0-9_]+)":\s*q_', body, re.M)


def main() -> int:
    cur = int(sys.argv[1]) if len(sys.argv) > 1 else None
    green = last_green()
    order = registry_order()
    if cur is None:
        cur = max(green.values()) + 1  # the round being prepared
    window, below = order[:WINDOW], order[WINDOW:]
    never = [q for q in order if q not in green]
    ok = True

    # 1. never-attested entries: in-window, or the contiguous block
    #    directly below it
    below_lead = []
    for q in below:
        if q in green:
            break
        below_lead.append(q)
    for q in never:
        if q not in window and q not in below_lead:
            print(f"VIOLATION: never-attested {q!r} is below the "
                  f"window but not in its leading block")
            ok = False

    # 2. staleness: nothing OUTSIDE the window may be older than
    #    MAX_AGE rounds once this round's window lands
    for q in below:
        if q in green and cur - green[q] > MAX_AGE:
            print(f"VIOLATION: {q!r} last green r{green[q]} "
                  f"(age {cur - green[q]} > {MAX_AGE}) and not in "
                  f"the r{cur} window")
            ok = False

    hist: dict[int, int] = {}
    for q in order:
        hist[green.get(q, 0)] = hist.get(green.get(q, 0), 0) + 1
    print(f"registry: {len(order)} entries; window={WINDOW}; "
          f"checking round r{cur}")
    print("last-green histogram (0 = never attested):",
          dict(sorted(hist.items())))
    print("window positions 1-10:", window[:10])
    print("below-window leaders (r{} rotation):".format(cur + 1),
          below_lead or "(none)")
    print("OK" if ok else "ROTATION POLICY VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
