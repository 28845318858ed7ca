"""Smoke test for the headline benchmark entry point.

The driver runs `python bench.py` unattended at the end of every round; a
broken bench silently costs the round its recorded number. This runs the
CPU-quick variant in a subprocess and checks the one-JSON-line contract.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def test_bench_quick_contract():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "bench.py", "--quick", "--repeats", "2",
         "--pipeline_depth", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    # last stdout line is the JSON contract the driver parses
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "samples/sec/chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    for key in ("spread_min", "spread_max", "chain_latency_ms",
                "mfu_vs_bf16_peak"):
        assert key in rec
    # an MFU past the hardware peak means the timing lied; the record must
    # carry the tripwire flag (and a healthy run must not)
    assert "timing_suspect" not in rec
    if rec["mfu_vs_bf16_peak"] is not None:
        assert rec["mfu_vs_bf16_peak"] <= 1.0
    # BASELINE.json names TWO metrics; the driver captures only bench.py's
    # single JSON line, so train steps/sec rides along as an extra
    assert rec["train_steps_per_sec"] > 0
    assert rec["train_step_device_ms"] > 0


def test_bench_cpu_fallback_on_dead_platform():
    """When the requested platform cannot initialize at all, the supervisor
    must still emit one JSON record — on the CPU backend, marked by the
    'platform' field — instead of exiting rc=1 with nothing (the round-2
    failure mode)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "bogus_tpu"
    env["BENCH_SUPERVISOR_ATTEMPTS"] = "1"
    out = subprocess.run(
        [sys.executable, "bench.py", "--quick", "--repeats", "1",
         "--pipeline_depth", "1", "--skip_train_bench",
         "--worker_timeout", "300"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["platform"] == "cpu"
    assert rec["value"] > 0
    assert "falling back to the CPU backend" in out.stderr


def test_graft_entry_contract():
    """The driver compile-checks `__graft_entry__.entry()` single-chip;
    make that contract CI-visible too."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/tmp/pharmaforge_jax_cache')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "import numpy as np\n"
        "assert np.isfinite(float(out))\n"
        "print('entry ok', float(out))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "entry ok" in out.stdout
