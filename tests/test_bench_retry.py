"""Unit tests for bench.py's backend-init retry wrapper.

Round 2's driver bench run died with an UNAVAILABLE backend-init error at
the very first `device_put` — before the (then compile-only) retry logic
could see it — and the round recorded no perf number. `_retry_device` now
wraps every device-touching phase; these tests pin its behavior without a
device: transient errors get a backend reset + retry, real bugs raise
immediately, and a dead backend eventually gives up.
"""

import importlib.util
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_recovers_from_transient_backend_init(bench, monkeypatch):
    resets = []
    monkeypatch.setattr(bench, "_reset_backend", lambda: resets.append(1))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            # the exact round-2 failure string class
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE: "
                "TPU backend setup/compile error (Unavailable).")
        return "ok"

    assert bench._retry_device(flaky, "test", first_delay=0.0) == "ok"
    assert calls["n"] == 3
    assert len(resets) == 2


def test_nontransient_raises_immediately(bench, monkeypatch):
    monkeypatch.setattr(bench, "_reset_backend",
                        lambda: pytest.fail("must not reset on a real bug"))
    calls = {"n": 0}

    def buggy():
        calls["n"] += 1
        raise ValueError("shape mismatch: this is a bug, not an outage")

    with pytest.raises(ValueError):
        bench._retry_device(buggy, "test")
    assert calls["n"] == 1


def test_gives_up_after_attempts(bench, monkeypatch):
    monkeypatch.setattr(bench, "_reset_backend", lambda: None)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def always_down():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: tunnel is gone")

    with pytest.raises(RuntimeError):
        bench._retry_device(always_down, "test", attempts=4, first_delay=0.0)
    assert calls["n"] == 4


def test_reset_failure_does_not_mask_retry(bench, monkeypatch):
    """A failing reset must not abort the retry loop itself."""
    def broken_reset():
        raise RuntimeError("reset exploded")

    monkeypatch.setattr(bench, "_reset_backend", broken_reset)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("UNAVAILABLE")
        return 42

    assert bench._retry_device(flaky, "test", first_delay=0.0) == 42
