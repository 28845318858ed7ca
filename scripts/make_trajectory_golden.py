"""Generate committed golden full-chain trajectory fixtures.

VERDICT r2 weak-spot #2: tests/reference_executor.py is an in-repo torch
re-implementation of the reference's semantics — if it and the jax chain
ever drifted *together*, the live parity test would keep passing. Freezing
one (weights, noise, pocket) triple plus the executor's full-chain output
as committed arrays converts the co-drift-capable oracle into a pinned one:
tests/test_golden_trajectory.py asserts BOTH the jax chain AND the live
executor still reproduce these arrays.

Run from the repo root (regenerates tests/golden/trajectory_*.npz):

    python -m scripts.make_trajectory_golden

Everything the test needs is stored in the npz — weights (reference
state_dict layout, keys prefixed ``sd::``), injected noise, pocket, init
COM, config — so reproducing the fixture does NOT depend on rng stream
stability across library versions.
"""

import json
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "golden"

# the two dynamic-edge semantics families (radius vs knn), matching
# tests/test_trajectory_parity.py::test_full_chain_trajectory_parity
CASES = {
    "radius": dict(ff_k=0, pf_k=0),
    "knn": dict(ff_k=3, pf_k=4),
}

PHARM_SIZES = [5, 4]
F_SLOTS, P_SLOTS = 8, 32


def build_case(overrides):
    import jax

    from pharmaforge_tpu.interop.torch_import import export_torch_state_dict
    from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
    from tests.reference_executor import ReferenceSampler
    from tests.test_trajectory_parity import (dense_batch, parity_config,
                                              sparse_pocket)

    rng = np.random.default_rng(0)
    cfg = parity_config(**overrides)
    model = PharmacophoreDiffusion(cfg)
    prot_x, prot_h = sparse_pocket(rng)
    batch = dense_batch(prot_x, prot_h, PHARM_SIZES, F_SLOTS, P_SLOTS)

    params = jax.device_get(model.init_params(jax.random.key(3), batch))
    state = export_torch_state_dict(params, cfg)

    T, b = cfg.n_timesteps, len(PHARM_SIZES)
    noise = {
        "x_T": rng.normal(size=(b, F_SLOTS, 3)).astype(np.float32),
        "h_T": rng.normal(size=(b, F_SLOTS, 6)).astype(np.float32),
        "pos": rng.normal(size=(T, b, F_SLOTS, 3)).astype(np.float32),
        "feat": rng.normal(size=(T, b, F_SLOTS, 6)).astype(np.float32),
    }
    init_com = prot_x.mean(axis=0) + np.array([1.0, -2.0, 0.5], np.float32)

    sampler = ReferenceSampler(state, cfg, np.asarray(model.gamma_table))
    payload = {
        "meta": np.bytes_(json.dumps({
            "config_overrides": overrides,
            "pharm_sizes": PHARM_SIZES,
            "f_slots": F_SLOTS,
            "p_slots": P_SLOTS,
        }).encode()),
        "prot_x": prot_x, "prot_h": prot_h,
        "init_com": init_com,
        "noise_x_T": noise["x_T"], "noise_h_T": noise["h_T"],
        "noise_pos": noise["pos"], "noise_feat": noise["feat"],
    }
    for k, v in state.items():
        payload[f"sd::{k}"] = np.asarray(v, np.float32)
    for i, n in enumerate(PHARM_SIZES):
        g_noise = {
            "x_T": noise["x_T"][i, :n], "h_T": noise["h_T"][i, :n],
            "pos": noise["pos"][:, i, :n], "feat": noise["feat"][:, i, :n],
        }
        ref_x, ref_h, ref_frames = sampler.sample(
            prot_h, prot_x, n, init_com, g_noise)
        payload[f"ref_x_{i}"] = np.asarray(ref_x, np.float32)
        payload[f"ref_h_{i}"] = np.asarray(ref_h, np.float32)
        payload[f"ref_frames_{i}"] = np.asarray(ref_frames, np.float32)
    return payload


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pharmaforge_jax_cache")

    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, overrides in CASES.items():
        payload = build_case(overrides)
        out = GOLDEN_DIR / f"trajectory_{name}.npz"
        np.savez_compressed(out, **payload)
        print(f"wrote {out} ({out.stat().st_size / 1024:.0f} KiB, "
              f"{len(payload)} arrays)")


if __name__ == "__main__":
    main()
