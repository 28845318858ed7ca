"""Interleaved A/B of one boolean DiffusionConfig knob at the bench workload.

AB_KNOB selects the field (default precompute_step_tables); AB_DEPTH /
AB_REPEATS / AB_POCKETS shape the run. Both variants are built in ONE
process and the repeats alternate — cross-process timings on this
tunneled deployment drift too much to compare (docs/performance.md).
"""
import time
import numpy as np
import jax

from pharmaforge_tpu.utils.misc import setup_jax

setup_jax()  # compile cache + honor JAX_PLATFORMS (CPU smoke runs)
jax.config.update("jax_default_matmul_precision", "bfloat16")

from pharmaforge_tpu.data.batch import tile_pocket
from pharmaforge_tpu.models.diffusion import DiffusionConfig, PharmacophoreDiffusion


def make_batch(pockets=int(__import__("os").environ.get("AB_POCKETS", "4")), copies=30, p=230):
    tiles = []
    for i in range(pockets):
        r = np.random.default_rng(i)
        dirs = r.normal(size=(p, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        px = (dirs * r.uniform(4, 12, (p, 1))).astype(np.float32)
        ph = np.eye(11, dtype=np.float32)[r.integers(0, 11, p)]
        sizes = np.random.default_rng(0).integers(3, 9, copies)
        tiles.append(tile_pocket(px, ph, sizes))
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *tiles), copies


import os as _os

# AB_T / AB_NCONVS let the same harness measure the full-scale regime
# (reference model defaults n_convs=4 — dynamics_gvp.py:62-75) where the
# per-copy middle convs dominate; T only scales chain length, not the
# per-step cost being compared, so T=100 keeps full-scale A/Bs quick.
base = dict(n_timesteps=int(_os.environ.get("AB_T", "100")),
            n_convs=int(_os.environ.get("AB_NCONVS", "2")),
            n_hidden_scalars=128,
            vector_size=16, message_norm="mean", n_message_gvps=3,
            n_update_gvps=2, n_noise_gvps=4, pf_k=5, pp_k_max=16,
            compute_dtype="bfloat16")
batch, group = make_batch()
b = batch.pharm_mask.shape[0]

fns = {}
params = None
for name, on in (("off", False), ("on", True)):
    import os
    knob = os.environ.get("AB_KNOB", "precompute_step_tables")
    model = PharmacophoreDiffusion(DiffusionConfig(**{knob: on}, **base))
    if params is None:
        params = model.init_params(jax.random.key(0), batch)
    f = jax.jit(lambda p, bt, k, m=model: m.sample_given_receptor(
        p, bt, k, pocket_group_size=group))
    out = f(params, batch, jax.random.key(1))
    from pharmaforge_tpu.utils.timing import fence
    fence(out["pharm_x"])
    fns[name] = f

import os
DEPTH = int(os.environ.get("AB_DEPTH", "8"))
REPEATS = int(os.environ.get("AB_REPEATS", "7"))
res = {"off": [], "on": []}
for r in range(REPEATS):
    for name, f in fns.items():
        t0 = time.perf_counter()
        outs = [f(params, batch, jax.random.key(100 + r * 17 + i))
                for i in range(DEPTH)]
        fence([o["pharm_x"] for o in outs])
        dt = (time.perf_counter() - t0) / DEPTH
        res[name].append(b / dt)

for name, vals in res.items():
    vals = sorted(vals)
    print(f"{name}: median {vals[len(vals)//2]:.1f} samples/s "
          f"(min {vals[0]:.1f}, max {vals[-1]:.1f})")
