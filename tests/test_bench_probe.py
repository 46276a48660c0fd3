"""Unit checks for bench.py's window-health canary.

The canary is measurement infrastructure (no Ray), but it gates what
gets RECORDED every round, so it deserves the same regression net as
the kernels: the probe must report a sane positive rate, the
multi-core variant must aggregate roughly linearly for tiny core
counts, and the hw-ceiling helper must return the documented shape.
Probes here run for fractions of a second so the suite stays cheap.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load_bench()


def test_probe_rate_positive(bench):
    rate = bench._probe_rate(secs=0.2)
    assert rate > 0


def test_probe_rate_multicore_aggregates(bench):
    if len(os.sched_getaffinity(0)) < 2:
        pytest.skip("needs >=2 cores")
    r1 = bench._probe_rate(secs=0.25, cores=1)
    r2 = bench._probe_rate(secs=0.25, cores=2)
    # 2 pinned cores must beat 1 by a clear margin (they run the same
    # loop concurrently on distinct cores); 1.3x is far below the ~2x
    # ideal but above any plausible single-core jitter
    assert r2 > 1.3 * r1


def test_hw_scaling_ceiling_shape(bench):
    if len(os.sched_getaffinity(0)) < 2:
        pytest.skip("needs >=2 cores")
    out = bench.hw_scaling_ceiling(1, 2, secs=0.25)
    assert set(out) == {"probe_rate_lo", "probe_rate_hi", "hw_ceiling"}
    assert out["probe_rate_lo"] > 0 and out["probe_rate_hi"] > 0
    # ceiling = (hi/lo)/(2/1): perfectly parallel work gives ~1.0;
    # anything in (0, 1.5] is sane on a contended box
    assert 0 < out["hw_ceiling"] <= 1.5


def test_healthy_constants_consistent(bench):
    # the documented relationship: MC threshold ~ 8 x single-core x
    # the measured 1->8 ceiling (0.85); allow generous slack so only a
    # unit mix-up (e.g. per-core vs aggregate) trips this
    lo = 8 * bench.HEALTHY_PROBE_RATE * 0.5
    hi = 8 * bench.HEALTHY_PROBE_RATE * 1.2
    assert lo < bench.HEALTHY_PROBE_RATE_MC < hi


def test_wait_for_healthy_window_retries_until_healthy(bench, monkeypatch):
    # depleted twice, then healthy: the loop must re-probe (bounded)
    # and return the recovered rates without a real 120 s sleep
    rates = iter(
        [
            0.1 * bench.HEALTHY_PROBE_RATE,      # initial 1-core: depleted
            0.1 * bench.HEALTHY_PROBE_RATE_MC,   # initial 8-core: depleted
            0.5 * bench.HEALTHY_PROBE_RATE,      # wait 1: still depleted
            0.5 * bench.HEALTHY_PROBE_RATE_MC,
            1.0 * bench.HEALTHY_PROBE_RATE,      # wait 2: healthy
            1.0 * bench.HEALTHY_PROBE_RATE_MC,
        ]
    )
    sleeps = []
    monkeypatch.setattr(bench, "_probe_rate", lambda *a, **k: next(rates))
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    monkeypatch.delenv("BENCH_NO_PROBE_WAIT", raising=False)
    probe, probe_mc = bench._wait_for_healthy_window()
    assert len(sleeps) == 2  # stopped as soon as both probes recovered
    assert probe >= 0.75 * bench.HEALTHY_PROBE_RATE
    assert probe_mc >= 0.75 * bench.HEALTHY_PROBE_RATE_MC


def test_wait_for_healthy_window_bounded_when_never_healthy(bench, monkeypatch):
    monkeypatch.setattr(
        bench, "_probe_rate",
        lambda *a, cores=1, **k: 0.1
        * (bench.HEALTHY_PROBE_RATE_MC if cores > 1 else bench.HEALTHY_PROBE_RATE),
    )
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    monkeypatch.delenv("BENCH_NO_PROBE_WAIT", raising=False)
    probe, _ = bench._wait_for_healthy_window()
    assert len(sleeps) == 3  # BENCH_PROBE_MAX_WAITS default — never unbounded
    assert probe < 0.75 * bench.HEALTHY_PROBE_RATE  # recorded as depleted
