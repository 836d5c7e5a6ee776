"""bench.py host-band adjudication (r13 verdict "what's wrong" #1):
a loaded-host group session must not poison the official record — any
query over 2x its BASELINE.md anchor is re-timed solo and the min is
recorded, with both numbers kept in the adjudication map.

Pure-logic tests: `adjudicate` takes the rerun callback, so no Spark
session is needed to simulate a slow first run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import adjudicate  # noqa: E402


def test_slow_group_run_is_rerun_solo_and_min_recorded():
    timings = {"q_noisy": 5.0, "q_fine": 1.1}
    base = {"q_noisy": 2.0, "q_fine": 1.0}
    calls = []

    def rerun(name):
        calls.append(name)
        return 1.8  # solo run on an idle box clears the anchor

    adj = adjudicate(timings, base, rerun, threshold=2.0)
    assert calls == ["q_noisy"]
    assert timings["q_noisy"] == 1.8
    assert timings["q_fine"] == 1.1  # under threshold: untouched
    assert adj == {"q_noisy": {"group": 5.0, "solo": 1.8,
                               "anchor": 2.0}}


def test_real_regression_keeps_the_slow_number():
    # a genuine regression reproduces solo — the record must show it
    timings = {"q_slow": 5.0}
    adj = adjudicate(timings, {"q_slow": 2.0}, lambda n: 4.9,
                     threshold=2.0)
    assert timings["q_slow"] == 4.9  # still over 2x: gate stays red
    assert adj["q_slow"]["group"] == 5.0


def test_solo_slower_than_group_keeps_group_min():
    timings = {"q": 5.0}
    adjudicate(timings, {"q": 2.0}, lambda n: 7.0, threshold=2.0)
    assert timings["q"] == 5.0  # min(group, solo)


def test_unanchored_queries_are_left_alone():
    # check_bench.py flags missing rows separately; adjudication must
    # not crash or rerun them
    timings = {"q_new": 9.9}
    assert adjudicate(timings, {}, lambda n: 0.1) == {}
    assert timings["q_new"] == 9.9


def test_failed_rerun_keeps_group_time_and_json_safe_record():
    import json

    timings = {"q": 5.0}
    adj = adjudicate(timings, {"q": 2.0}, lambda n: float("inf"),
                     threshold=2.0)
    assert timings["q"] == 5.0  # group measurement stands
    assert adj["q"]["solo"] is None  # json.dumps-safe (no Infinity)
    json.dumps(adj)


def test_threshold_boundary_is_exclusive():
    timings = {"q": 4.0}
    assert adjudicate(timings, {"q": 2.0}, lambda n: 0.1,
                      threshold=2.0) == {}
    assert timings["q"] == 4.0
