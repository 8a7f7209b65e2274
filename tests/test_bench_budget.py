"""bench.py robustness gates (VERDICT r03 ask #7).

Three rounds of official bench artifacts were lost (r01 weak legs, r02
clipped line, r03 rc-124 kill with ``parsed: null``).  These tests pin the
round-4 contract with fast fakes — no Spark session, no corpus:

* the overall wall-clock budget stops ``_interleaved_min`` sampling,
* the emitted stdout line parses as JSON and stays under the driver's
  ~2000-char tail capture,
* a SIGTERM mid-run still yields a parseable line (rc 143, flushed by the
  signal handler) instead of nothing.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def bench():
    import bench as b
    # importing bench registers an atexit flush of the (empty) state line;
    # mark it emitted so pytest's own exit stays clean
    b._EMITTED = True
    return b


def _leg(sec: float, cpus: int) -> dict:
    return {"cpus": cpus, "seconds": sec, "urls_per_sec": 1000.0 / sec,
            "user_pct": 80.0, "sys_pct": 5.0, "steal_pct": 0.0,
            "iowait_pct": 0.0}


def test_budget_stop_triggers(bench):
    calls = []

    def run_pair(r):
        time.sleep(0.25)
        calls.append(r)
        # never-stabilizing minima so only the budget can stop the loop
        return _leg(10.0 / (r + 1), 2), _leg(3.0 / (r + 1), 8)

    deadline = bench._elapsed() + 0.4  # first round fits, second would not
    runs = bench._interleaved_min(run_pair, max_repeats=50,
                                  deadline=deadline)
    assert runs.get("budget_stopped") is True
    assert len(calls) < 50  # stopped long before the repeat cap
    assert runs["n"] and runs["4n"]  # partial results preserved


def test_reserve_fn_stops_pair_rounds_earlier(bench):
    """With a reserve_fn the pair loop must refuse a round that would
    starve the caller's post-loop top-up legs — without the reserve the
    same deadline admits the round (the r4 0.705-run failure mode)."""
    def make_pair(calls):
        def run_pair(r):
            time.sleep(0.2)
            calls.append(r)
            return _leg(10.0 / (r + 1), 1), _leg(3.0 / (r + 1), 4)
        return run_pair

    with_res, without = [], []
    deadline = bench._elapsed() + 0.62
    runs = bench._interleaved_min(make_pair(with_res), max_repeats=50,
                                  deadline=deadline,
                                  reserve_fn=lambda runs: 0.3)
    assert runs.get("budget_stopped") is True
    deadline = bench._elapsed() + 0.62
    bench._interleaved_min(make_pair(without), max_repeats=50,
                           deadline=deadline)
    assert len(with_res) < len(without)  # the reserve held rounds back


def test_budget_stop_keeps_checkpointed_state(bench):
    """on_round must have populated best-so-far state BEFORE the stop, so a
    later kill still has numbers to flush."""
    seen = []

    def run_pair(r):
        time.sleep(0.2)
        return _leg(8.0, 2), _leg(2.2, 8)

    bench._interleaved_min(run_pair, max_repeats=50,
                           deadline=bench._elapsed() + 0.3,
                           on_round=lambda runs: seen.append(
                               (len(runs["n"]), len(runs["4n"]))))
    assert seen and seen[0] == (1, 1)


def test_next_round_estimate_tighter_than_wall(bench):
    """Round 1 wall time carries one-time costs (calibration, first-child
    import); the budget check must use the legs' own timed samples +
    overhead so a second round that genuinely fits is not refused."""
    calls = []

    def run_pair(r):
        calls.append(r)
        time.sleep(0.5)  # wall per round >> timed samples
        return (dict(_leg(0.01, 2), samples=[0.01]),
                dict(_leg(0.01, 8), samples=[0.01]))

    runs = bench._interleaved_min(
        run_pair, max_repeats=2,
        # after round 1 (~0.5 s wall) only ~0.3 s remain: the wall-based
        # estimate (0.5) would refuse round 2, the sample-sum one (0.02)
        # admits it
        deadline=bench._elapsed() + 0.8,
        overhead_s=0.0)
    assert len(calls) == 2  # wall-based estimate would have stopped at 1
    assert "budget_stopped" not in runs


def test_crashed_leg_counts_as_contaminated_and_eff_filters_none(bench):
    """A leg subprocess crash/timeout returns None: _interleaved_min must
    keep sampling until each leg has a real quiet measurement, and _eff
    must compute from the surviving legs only."""
    calls = []

    def run_pair(r):
        calls.append(r)
        # first round: 4N leg crashed; second round: both fine
        return (_leg(8.0, 2), None) if r == 0 else (_leg(8.0, 2),
                                                    _leg(2.4, 8))

    runs = bench._interleaved_min(run_pair, max_repeats=2)
    assert len(calls) == 2
    low, high, eff = bench._eff(runs)
    assert low["seconds"] == 8.0 and high["seconds"] == 2.4
    assert eff == round(8.0 / 2.4 / 4, 3)

    none_runs = {"n": [None], "4n": [_leg(2.0, 8)]}
    assert bench._eff(none_runs) == (None, None, None)


def test_emitted_line_parses_and_fits_tail_capture(bench):
    state = {"metric": "suite_seconds", "value": 52.1, "unit": "sec",
             "queries": {f"query_name_{i:02d}": 1.234 for i in range(21)},
             "sf": 0.1,
             "crawl": {"n_cores": _leg(215.3, 2), "4n_cores": _leg(64.2, 8),
                       "scaling_efficiency": 0.838, "rounds": 2,
                       "geometry_note": "2v8 legs; see BENCH/BASELINE.md "
                                        "§1.1b/d",
                       "per_thread_urls_s_at_2_8_16": [606, 526, 277],
                       "parse_stage": {"n_cores": _leg(81.0, 2),
                                       "4n_cores": _leg(23.6, 8),
                                       "scaling_efficiency": 0.858,
                                       "rounds": 2},
                       "detail": "BENCH/bench_detail.json"}}
    line = bench._render_line(state)
    assert len(line) < 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "suite_seconds"
    # the crawl scaling numbers must survive even if queries get dropped
    assert parsed["crawl"]["scaling_efficiency"] == 0.838
    assert parsed["crawl"]["parse_stage"]["scaling_efficiency"] == 0.858


def test_oversize_line_drops_queries_not_crawl(bench):
    state = {"metric": "suite_seconds", "value": 1.0, "unit": "sec",
             "queries": {f"q{i}": 1.0 for i in range(400)},
             "crawl": {"scaling_efficiency": 0.9}}
    line = bench._render_line(state)
    assert len(line) < 1900
    parsed = json.loads(line)
    assert "queries" not in parsed
    assert parsed["queries_note"]
    assert parsed["crawl"]["scaling_efficiency"] == 0.9


def test_sigterm_mid_run_still_emits_parseable_line():
    """A driver timeout kill (SIGTERM) must flush the best-so-far line to
    stdout — the r03 failure mode (rc 124, parsed: null) must be impossible
    as long as the process gets any catchable signal."""
    script = textwrap.dedent("""
        import os, sys, time
        os.environ["BENCH_WAIT_QUIET_S"] = "0"  # pytest itself is running
        os.environ["BENCH_LAST_LINE_PATH"] = os.devnull  # keep the real artifact
        os.environ["BENCH_QUERIES_SUBPROC"] = "0"  # fakes below need inline
        sys.path.insert(0, %r)
        import bench
        bench.run_queries = lambda spark, sf_dir: {"fake_q": 0.5}
        class _S:  # stand-in session: run_queries fake never touches it
            def stop(self): pass
        bench.get_spark = lambda **kw: _S()
        bench._quiet = lambda s: s
        def slow_scaling(out):
            out["crawl"] = {"scaling_efficiency": 0.83, "rounds": 1}
            print("SCALING-STARTED", file=sys.stderr, flush=True)
            time.sleep(120)
        bench.run_scaling = slow_scaling
        bench.main()
    """) % REPO
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    # wait until the fake scaling phase is underway, then kill like the
    # driver's timeout does
    deadline = time.time() + 60
    started = False
    err = b""
    os.set_blocking(proc.stderr.fileno(), False)
    while time.time() < deadline:
        chunk = proc.stderr.raw.read(65536)
        if chunk:
            err += chunk
            if b"SCALING-STARTED" in err:
                started = True
                break
        time.sleep(0.1)
    assert started, "fake bench never reached the scaling phase: %r" % err
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 143
    line = out.decode().strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["terminated_early"] is True
    assert parsed["queries"] == {"fake_q": 0.5}
    assert parsed["crawl"]["scaling_efficiency"] == 0.83
    assert "elapsed_at_kill" in parsed


def test_wait_for_own_quiet_excludes_ancestors(monkeypatch):
    """The pre-bench quiet guard ignores its own ancestor chain (a pytest
    that spawned the bench is blocked on it) but waits, bounded, for
    foreign test jobs."""
    import subprocess as sp

    import bench as b

    class _R:
        def __init__(self, out):
            self.stdout = out

    # only ancestors reported -> returns immediately
    own = f"{os.getpid()}\n{os.getppid()}\n"
    monkeypatch.setattr(sp, "run", lambda *a, **kw: _R(own))
    t0 = time.monotonic()
    b._wait_for_own_quiet(max_wait=30.0)
    assert time.monotonic() - t0 < 1.0

    # a foreign pid -> bounded wait, then proceeds
    monkeypatch.setattr(sp, "run", lambda *a, **kw: _R(own + "99999999\n"))
    monkeypatch.setattr(b.time, "sleep", lambda s: None)
    t0 = time.monotonic()
    b._wait_for_own_quiet(max_wait=0.2)
    assert time.monotonic() - t0 < 5.0
