"""Generate the policy-ordered driver window (SURVEY §15) — the r10
verdict's order #6: the window is a PURE FUNCTION of the merged
CORRECTNESS files, the registry, and the changed-entries list, so a
short round can no longer end with the rotation silently skipped.

Window order (§15 policy):
1a. entries in scripts/CHANGED_QUERIES (file order) — operators or
    oracles changed since their last attestation, new queries first;
1b. never-attested entries not already placed (registry order);
1c. the oldest-attested block, (last_green asc, name asc), filling
    to 50.

Usage:
  python scripts/make_window.py            # print the window
  python scripts/make_window.py --check    # exit 1 unless the current
                                           # queries() head == window

tests/test_rotation.py runs --check's logic inside the suite, so the
per-round "keep tests green" gate fails loudly on a stale window.

Backlog note (r11): a skipped rotation round creates MORE stale
entries than one 50-slot window can clear (the r10 skip left 73
age>=4 entries + 12 changed/new for 50 slots).  The generator then
fills with the OLDEST and records the carry-over: check_rotation.py
keeps reporting the un-fittable remainder until the cycle
re-converges (steady state for a 175-entry registry is a 4-round
cycle; after a skip it takes ~2 catch-up rounds).
"""

from __future__ import annotations

import os
import signal
import sys

# When piped to `head`, a BrokenPipeError during print must not mask
# the exit code (the r11 judge saw --check "pass" under `| head`);
# default SIGPIPE keeps the shell pipeline's exit status honest.
if hasattr(signal, "SIGPIPE"):
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_rotation import WINDOW, last_green, registry_order  # noqa: E402

_HERE = os.path.dirname(os.path.abspath(__file__))


def changed_list() -> list[tuple[str, int | None]]:
    """(name, round-the-change-landed) pairs; round None = never
    auto-retire (lead until the line is pruned by hand)."""
    path = os.path.join(_HERE, "CHANGED_QUERIES")
    if not os.path.exists(path):
        return []
    out = []
    for ln in open(path):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        parts = ln.split()
        out.append((parts[0],
                    int(parts[1]) if len(parts) > 1 else None))
    return out


def make_window(order: list[str] | None = None,
                green: dict[str, int] | None = None) -> list[str]:
    order = registry_order() if order is None else order
    green = last_green() if green is None else green
    window: list[str] = []
    known = set(order)
    # a changed entry leads the window only UNTIL the driver attests
    # the changed form: each CHANGED_QUERIES line carries the round
    # its change landed, and that round's CORRECTNESS file is written
    # at the round's END — so green >= changed_round means the changed
    # form was attested and the entry rotates normally.  A stale file
    # therefore cannot pin last round's entries to the front forever.
    for q, rnd in changed_list():
        if q in known and q not in window \
                and (rnd is None or green.get(q, 0) < rnd):
            window.append(q)
    for q in order:  # 1b: never-attested
        if q not in green and q not in window:
            window.append(q)
    rest = sorted((q for q in order if q not in window),
                  key=lambda q: (green.get(q, 0), q))
    window += rest[:WINDOW - len(window)]
    return window[:WINDOW]


def main() -> int:
    order = registry_order()
    green = last_green()
    window = make_window(order, green)
    if "--check" in sys.argv:
        cur = order[:WINDOW]
        if cur != window:
            for i, (a, b) in enumerate(zip(cur, window)):
                if a != b:
                    print(f"WINDOW STALE at position {i + 1}: "
                          f"registry has {a!r}, policy wants {b!r}")
            print("run: python scripts/make_window.py  and reorder "
                  "__spark_entry__.queries() to match")
            return 1
        print(f"window OK ({WINDOW} entries match the policy order)")
        return 0
    for i, q in enumerate(window):
        print(f"{i + 1:3d}  {q}  (last green r{green.get(q, 0)})")
    carry = [q for q in order[WINDOW:] if q in green]
    cur_round = max(green.values()) + 1
    stale = sorted(q for q in carry if cur_round - green[q] > 3)
    if stale:
        print(f"\ncarry-over backlog ({len(stale)} entries stay past "
              f"the age invariant this round; they lead the next "
              f"window):")
        print("  " + ", ".join(stale))
    return 0


if __name__ == "__main__":
    sys.exit(main())
