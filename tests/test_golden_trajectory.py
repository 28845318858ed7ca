"""Pinned full-chain trajectories against COMMITTED golden arrays.

tests/test_trajectory_parity.py proves the jax chain and the in-repo torch
reference executor agree — but both live in this repo, so a shared
misreading of the reference could drift them together without failing
anything. These tests pin both sides to frozen fixtures
(tests/golden/trajectory_*.npz, generated once by
`python -m scripts.make_trajectory_golden`):

* the LIVE torch executor must still reproduce the frozen chain to 1e-4
  max-abs (same math, same backend — only real executor changes or BLAS
  build differences register here), and
* the jax `sample_given_receptor` scan must reproduce it to the live
  parity tolerance (2e-3 over the T=100 chain: float32 matmul
  reassociation across backends accumulates ~1e-3 over 100 steps; the
  single-forward deviation is ~2e-5, see
  test_single_forward_parity_message_norm_variants).

Any one-sided drift — executor OR chain — now fails a test.
"""

import json
from pathlib import Path

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

from pharmaforge_tpu.interop.torch_import import import_torch_state_dict
from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
from tests.reference_executor import ReferenceSampler
from tests.test_trajectory_parity import dense_batch, parity_config

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"
CASES = ["radius", "knn"]


def load_case(name):
    path = GOLDEN_DIR / f"trajectory_{name}.npz"
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    state = {k[len("sd::"):]: data[k] for k in data.files
             if k.startswith("sd::")}
    noise = {"x_T": data["noise_x_T"], "h_T": data["noise_h_T"],
             "pos": data["noise_pos"], "feat": data["noise_feat"]}
    return data, meta, state, noise


@pytest.mark.parametrize("name", CASES)
def test_live_executor_matches_frozen_chain(name):
    """The torch oracle itself is pinned: same weights + noise must yield
    the committed frames near-exactly."""
    data, meta, state, noise = load_case(name)
    cfg = parity_config(**meta["config_overrides"])
    from pharmaforge_tpu.models.schedules import make_gamma_table
    gamma = make_gamma_table(cfg.noise_schedule, cfg.n_timesteps,
                             precision=cfg.precision)
    sampler = ReferenceSampler(state, cfg, gamma)

    prot_x, prot_h = data["prot_x"], data["prot_h"]
    for i, n in enumerate(meta["pharm_sizes"]):
        g_noise = {
            "x_T": noise["x_T"][i, :n], "h_T": noise["h_T"][i, :n],
            "pos": noise["pos"][:, i, :n], "feat": noise["feat"][:, i, :n],
        }
        ref_x, ref_h, ref_frames = sampler.sample(
            prot_h, prot_x, n, data["init_com"], g_noise)
        np.testing.assert_allclose(ref_frames, data[f"ref_frames_{i}"],
                                   atol=1e-4)
        np.testing.assert_allclose(ref_x, data[f"ref_x_{i}"], atol=1e-4)
        np.testing.assert_allclose(ref_h, data[f"ref_h_{i}"], atol=1e-4)


@pytest.mark.parametrize("name", CASES)
def test_jax_chain_matches_frozen_chain(name):
    """The jitted lax.scan chain is pinned to the same frozen arrays,
    independently of the live executor."""
    data, meta, state, noise = load_case(name)
    cfg = parity_config(**meta["config_overrides"])
    model = PharmacophoreDiffusion(cfg)
    params = import_torch_state_dict(state, cfg)

    sizes = meta["pharm_sizes"]
    batch = dense_batch(data["prot_x"], data["prot_h"], sizes,
                        meta["f_slots"], meta["p_slots"])
    b = len(sizes)
    init_com_b = np.broadcast_to(data["init_com"], (b, 3))
    out = model.sample_given_receptor(
        params, batch, jax.random.key(0), init_pharm_com=init_com_b,
        visualize_trajectory=True, noise=noise)
    jax_traj = np.asarray(out["traj_x"])

    for i, n in enumerate(sizes):
        frozen = data[f"ref_frames_{i}"]
        # ours logs the initial frame first: frame k+1 <-> reference step k
        step_dev = np.abs(jax_traj[1:, i, :n] - frozen).max(axis=(1, 2))
        assert step_dev.max() < 2e-3, (
            f"graph {i}: max per-step deviation {step_dev.max():.2e} at "
            f"step {step_dev.argmax()}")
        np.testing.assert_allclose(np.asarray(out["pharm_x"])[i, :n],
                                   data[f"ref_x_{i}"], atol=2e-3)
        np.testing.assert_allclose(np.asarray(out["pharm_h"])[i, :n],
                                   data[f"ref_h_{i}"], atol=2e-3)
