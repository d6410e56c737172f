"""bench.py backend acquisition — the retry/budget logic that guards the
round's scoreboard artifact (BENCH_r02 was lost to ONE transient relay
UNAVAILABLE at init with no retry; VERDICT r2 item 1).

These tests drive `acquire_device` with a faked `jax.devices` so the
bounded-retry contract is pinned without a TPU: transient failures are
retried, persistent failures exhaust the attempt budget, and a slow
blocking init exhausts the TIME budget instead of retrying forever.
"""
import importlib.util
import os
import sys
import types

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("_bench_under_test", _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def bench(monkeypatch):
    mod = _load_bench()
    # no real sleeping between faked attempts
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


def _fake_jax(devices_fn):
    jx = types.SimpleNamespace(
        devices=devices_fn, default_backend=lambda: "fake"
    )
    return jx


def _install(monkeypatch, jx):
    # acquire_device does `import jax` lazily — route it to the fake
    monkeypatch.setitem(sys.modules, "jax", jx)


def test_transient_failure_is_retried(bench, monkeypatch):
    calls = []

    def devices():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE: "
                "TPU backend setup/compile error (Unavailable)."
            )
        return ["DEV0"]

    _install(monkeypatch, _fake_jax(devices))
    assert bench.acquire_device() == "DEV0"
    assert len(calls) == 3  # two failures absorbed, third attempt wins


def test_persistent_failure_exhausts_attempts(bench, monkeypatch):
    calls = []

    def devices():
        calls.append(1)
        raise RuntimeError("UNAVAILABLE: down")

    _install(monkeypatch, _fake_jax(devices))
    with pytest.raises(RuntimeError) as e:
        bench.acquire_device()
    assert len(calls) == bench.BACKEND_ATTEMPTS
    # the raised error carries every per-attempt message for the log
    assert str(e.value).count("UNAVAILABLE: down") == bench.BACKEND_ATTEMPTS


def test_blocking_init_exhausts_time_budget(bench, monkeypatch):
    """The relay has been measured to BLOCK ~25 min inside init before
    raising — the total time budget must stop the loop after the first
    failure in that regime (not burn 5 x 25 min against the driver's
    external timeout)."""
    now = [0.0]
    monkeypatch.setattr(bench.time, "monotonic", lambda: now[0])
    calls = []

    def devices():
        calls.append(1)
        now[0] += bench.BACKEND_TOTAL_BUDGET_S  # one budget-length block
        raise RuntimeError("UNAVAILABLE: blocked long")

    _install(monkeypatch, _fake_jax(devices))
    with pytest.raises(RuntimeError):
        bench.acquire_device()
    assert len(calls) == 1


def test_immediate_success_single_attempt(bench, monkeypatch):
    _install(monkeypatch, _fake_jax(lambda: ["DEV0"]))
    assert bench.acquire_device() == "DEV0"
