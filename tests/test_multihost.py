"""Real 2-process jax.distributed run of the multi-host data path.

SURVEY §2.4: the DP design "must be correct for multi-host DCN too".
VERDICT r2 weak-spot #5: `assemble_from_process_local` /
`process_local_rows` had never executed under an actual
`jax.distributed` 2-process setup. This launches two coordinated CPU
processes (4 virtual devices each — a local stand-in for two hosts on
DCN), runs one sharded train step through the multi-host branches, and
asserts the loss equals the single-process run of the identical
(params, batch, key).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(process_id, coordinator, env):
    return subprocess.Popen(
        [sys.executable, "-m", "tests._multihost_main",
         "--process_id", str(process_id), "--num_processes", "2",
         "--coordinator", coordinator],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)


def test_two_process_distributed_train_step():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the worker sets the 4-device flag itself; scrub any 8-device flag the
    # surrounding test env may carry
    env.pop("XLA_FLAGS", None)

    # retry once: concurrent multi-device XLA CPU runtimes can deadlock
    # spuriously on this 1-core host (environment bug — see conftest note)
    for attempt in range(2):
        coordinator = f"127.0.0.1:{_free_port()}"
        p0 = _launch(0, coordinator, env)
        p1 = _launch(1, coordinator, env)
        try:
            out0, err0 = p0.communicate(timeout=900)
            out1, err1 = p1.communicate(timeout=900)
            break
        except subprocess.TimeoutExpired:
            p0.kill()
            p1.kill()
            p0.communicate()
            p1.communicate()
            if attempt == 1:
                pytest.fail("2-process distributed run timed out twice")

    assert p0.returncode == 0, (out0[-1000:], err0[-3000:])
    assert p1.returncode == 0, (out1[-1000:], err1[-3000:])
    for out in (out0, out1):
        assert "MULTIHOST_OK" in out
        assert "MULTIHOST_CONTIG_OK" in out

    # each process loaded a distinct contiguous half of the global batch
    rows0 = [ln for ln in out0.splitlines()
             if ln.startswith("MULTIHOST_ROWS")][0].split()
    rows1 = [ln for ln in out1.splitlines()
             if ln.startswith("MULTIHOST_ROWS")][0].split()
    assert (rows0[2], rows0[3]) == ("0", "8")
    assert (rows1[2], rows1[3]) == ("8", "16")

    loss0 = float([ln for ln in out0.splitlines()
                   if ln.startswith("MULTIHOST_LOSS")][0].split()[1])
    loss1 = float([ln for ln in out1.splitlines()
                   if ln.startswith("MULTIHOST_LOSS")][0].split()[1])
    assert loss0 == loss1, "replicated loss must agree across processes"

    # single-process run of the identical (params, batch, key)
    from tests._multihost_main import run_reference_single_process
    ref_loss = run_reference_single_process()
    assert abs(loss0 - ref_loss) < 1e-5, (loss0, ref_loss)
