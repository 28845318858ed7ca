"""Multi-chip (virtual 8-device CPU mesh) validation.

Runs the full data-parallel training step over a `jax.sharding.Mesh` in a
subprocess with `--xla_force_host_platform_device_count=8`, mirroring what
the driver's `dryrun_multichip` does. Subprocess isolation keeps the
intermittent single-core 8-device XLA CPU deadlock (see conftest note) from
taking down the rest of the suite, and a hard timeout turns a hang into a
visible failure.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    code = (
        "import jax\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/tmp/pharmaforge_jax_cache')\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    # retry once: the 8-virtual-device CPU runtime can deadlock spuriously
    # on this 1-core host (environment bug, not a sharding bug)
    for attempt in range(2):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], cwd=REPO, env=env,
                capture_output=True, text=True, timeout=1500)
            break
        except subprocess.TimeoutExpired:
            if attempt == 1:
                pytest.fail("dryrun_multichip timed out twice")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8)" in out.stdout


@pytest.mark.slow
def test_mesh_sampling_subprocess():
    """Mesh-sharded sampling must equal single-device sampling (per-pocket
    sharded-copies path AND the stacked multi-pocket fallback)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    for attempt in range(2):
        try:
            out = subprocess.run(
                [sys.executable, "-m", "tests._mesh_sampling_main"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=1500)
            break
        except subprocess.TimeoutExpired:
            if attempt == 1:
                pytest.fail("mesh sampling run timed out twice")
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    assert "mesh_sampling OK" in out.stdout


@pytest.mark.slow
def test_dp_invariance_subprocess():
    """mesh=1 and mesh=8 must produce the same loss, updated params, and
    validation metrics on one batch (VERDICT r1 #5)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    for attempt in range(2):
        try:
            out = subprocess.run(
                [sys.executable, "-m", "tests._dp_invariance_main"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=1500)
            break
        except subprocess.TimeoutExpired:
            if attempt == 1:
                pytest.fail("dp invariance run timed out twice")
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    assert "dp_invariance OK" in out.stdout
