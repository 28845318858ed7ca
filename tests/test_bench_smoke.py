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
    # BASELINE.json names TWO metrics; the driver captures only bench.py's
    # single JSON line, so train steps/sec rides along as an extra
    assert rec["train_steps_per_sec"] > 0
    assert rec["train_step_device_ms"] > 0


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
