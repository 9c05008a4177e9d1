"""The probe-runner measurement guard (VERDICT r11 #5): a
linear-expectation family whose big-factor leg measures FASTER than its
small-factor leg is physically impossible — the runner must re-time it
within-session and mark the row POLLUTED if the inversion persists,
instead of publishing a number the box already disproved.  Pure-function
tests with an injected timer; no Spark."""

import importlib.util
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "scale_probe",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "scale_probe.py"),
)
scale_probe = importlib.util.module_from_spec(_SPEC)
sys.modules.setdefault("scale_probe", scale_probe)
_SPEC.loader.exec_module(scale_probe)

monotone_violations = scale_probe.monotone_violations
time_with_guard = scale_probe.time_with_guard


def test_monotone_violations_flags_only_linear_inversions():
    times = {
        "linear_ok": {30: 1.0, 100: 3.1},
        "linear_bad": {30: 2.0, 100: 1.2},   # impossible
        "flat_fastish": {30: 0.5, 100: 0.45},  # flat family: fine
        "partial": {30: 1.0},                 # one leg: not comparable
    }
    got = monotone_violations(times, {"linear_ok", "linear_bad", "partial"})
    assert got == ["linear_bad"]
    # a flat family is never flagged even when slightly inverted
    assert monotone_violations(times, {"flat_fastish"}) == ["flat_fastish"], (
        "sanity: the function itself is expectation-agnostic — the "
        "CALLER exempts flat families via the linear set"
    )


class _ScriptedTimer:
    """Returns scripted values per (family, call index)."""

    def __init__(self, script):
        self.script = {k: list(v) for k, v in script.items()}
        self.calls = []

    def __call__(self, token, reps):
        self.calls.append(token)
        return self.script[token].pop(0)


def _builders(names):
    # builder returns a token identifying (name, factor) so the fake
    # timer can script per-leg values
    return {
        n: {30: (lambda n=n: f"{n}@30"), 100: (lambda n=n: f"{n}@100")}
        for n in names
    }


def test_guard_retimes_and_clears_transient_inversion():
    timer = _ScriptedTimer({
        "a@30": [2.0, 1.0],   # first pass inverted, rerun sane
        "a@100": [1.5, 3.0],
        "b@30": [1.0],
        "b@100": [3.2],
    })
    times, polluted = time_with_guard(
        _builders(["a", "b"]), reps=1, linear={"a", "b"}, timer=timer
    )
    assert polluted == set()
    assert times["a"] == {30: 1.0, 100: 3.0}  # the RERUN numbers stand
    assert times["b"] == {30: 1.0, 100: 3.2}  # untouched: one timing each
    assert timer.calls.count("a@30") == 2 and timer.calls.count("b@30") == 1


def test_guard_marks_persistent_inversion_polluted():
    timer = _ScriptedTimer({
        "a@30": [2.0, 2.1],
        "a@100": [1.5, 1.4],  # still impossible after the rerun
    })
    times, polluted = time_with_guard(
        _builders(["a"]), reps=1, linear={"a"}, timer=timer
    )
    assert polluted == {"a"}
    assert times["a"] == {30: 2.1, 100: 1.4}


def test_guard_retimes_superlinear_overshoot_and_keeps_rerun():
    """retime_over: a linear family over the threshold is re-timed once
    at the end of the run; the rerun values REPLACE the first reading
    whatever they say (cleared here; a still-high rerun would also
    stand — no retry-until-it-fits)."""
    timer = _ScriptedTimer({
        "a@30": [2.0, 2.0],
        "a@100": [16.0, 6.2],  # 8.0 ratio first pass, 3.1 on retime
        "b@30": [1.0],
        "b@100": [3.2],        # under threshold: single timing
    })
    times, polluted = time_with_guard(
        _builders(["a", "b"]), reps=1, linear={"a", "b"}, timer=timer,
        retime_over=5.0,
    )
    assert polluted == set()
    assert times["a"] == {30: 2.0, 100: 6.2}
    assert times["b"] == {30: 1.0, 100: 3.2}
    assert timer.calls.count("a@100") == 2 and timer.calls.count("b@100") == 1


def test_guard_skips_flat_families():
    timer = _ScriptedTimer({
        "flat@30": [0.50],
        "flat@100": [0.45],  # inverted but exempt
    })
    times, polluted = time_with_guard(
        _builders(["flat"]), reps=1, linear=set(), timer=timer
    )
    assert polluted == set()
    assert len(timer.calls) == 2  # no rerun
