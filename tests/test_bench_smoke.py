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
