"""Interleaved A/B over `pockets_per_call` (device-batch width) at the
bench workload, synced with the honest timing fence.

The knee documented in docs/performance.md (8 pockets after
dedup_prot_encoder; 16 "+~4%") was measured under the old
block_until_ready sync, which round-3 probing showed can return before
execution on this tunneled deployment — so the knee needs re-validation
under utils/timing.fence. Variants are built in ONE process and the
repeats alternate (cross-process timings drift up to 2x here).

    AB_POCKET_GRID=4,8,12,16 AB_DEPTH=8 AB_REPEATS=5 \
        python -m scripts.ab_pockets

Prints one line per grid point: median samples/s (min..max) over repeats,
where samples = pockets * 30 copies per call.
"""
import os
import time

import numpy as np
import jax

from pharmaforge_tpu.utils.misc import setup_jax

setup_jax()  # compile cache + honor JAX_PLATFORMS (CPU smoke runs)
jax.config.update("jax_default_matmul_precision", "bfloat16")

from pharmaforge_tpu.data.batch import tile_pocket
from pharmaforge_tpu.data.synthetic import make_synthetic_pocket
from pharmaforge_tpu.models.diffusion import DiffusionConfig, \
    PharmacophoreDiffusion
from pharmaforge_tpu.utils.timing import fence

GRID = [int(x) for x in
        os.environ.get("AB_POCKET_GRID", "4,8,12,16").split(",")]
DEPTH = int(os.environ.get("AB_DEPTH", "8"))
REPEATS = int(os.environ.get("AB_REPEATS", "5"))
COPIES = int(os.environ.get("AB_COPIES", "30"))
P_ATOMS = int(os.environ.get("AB_POCKET_ATOMS", "230"))

# AB_T / AB_NCONVS: the full-scale regime (n_convs=4 — reference
# dynamics_gvp.py:62-75) has a different knee than dev; per-STEP cost is
# T-invariant so the knee can be swept at T=100 with full-scale convs.
cfg = DiffusionConfig(n_timesteps=int(os.environ.get("AB_T", "100")),
                      n_convs=int(os.environ.get("AB_NCONVS", "2")),
                      n_hidden_scalars=128,
                      vector_size=16, message_norm="mean",
                      n_message_gvps=3, n_update_gvps=2, n_noise_gvps=4,
                      pf_k=5, pp_k_max=16, compute_dtype="bfloat16")
model = PharmacophoreDiffusion(cfg)

sizes = np.random.default_rng(0).integers(3, 9, COPIES)


def make_batch(n_pockets):
    tiles = []
    for i in range(n_pockets):
        r = np.random.default_rng(i)
        px, pe = make_synthetic_pocket(r, np.zeros(3), P_ATOMS)
        tiles.append(tile_pocket(px.astype(np.float32),
                                 np.eye(11, dtype=np.float32)[pe],
                                 sizes, max_prot=P_ATOMS))
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *tiles)


variants = {}
params = None
for n in GRID:
    batch = make_batch(n)
    if params is None:
        params = model.init_params(jax.random.key(0), batch)
    f = jax.jit(lambda p, bt, k: model.sample_given_receptor(
        p, bt, k, pocket_group_size=COPIES))
    t0 = time.perf_counter()
    out = f(params, batch, jax.random.key(1))
    fence(out["pharm_x"])
    print(f"pockets={n}: compiled+warm in {time.perf_counter() - t0:.0f}s",
          flush=True)
    fence([out["pharm_x"]] * DEPTH)  # pre-warm the fence digest arity
    variants[n] = (f, batch)

res = {n: [] for n in GRID}
for r in range(REPEATS):
    for n, (f, batch) in variants.items():
        t0 = time.perf_counter()
        outs = [f(params, batch, jax.random.key(100 + r * 17 + i))
                for i in range(DEPTH)]
        fence([o["pharm_x"] for o in outs])
        dt = time.perf_counter() - t0
        res[n].append(DEPTH * n * COPIES / dt)

for n, vals in res.items():
    vals = sorted(vals)
    print(f"pockets={n:3d}: median {vals[len(vals) // 2]:8.1f} samples/s "
          f"(min {vals[0]:.1f}, max {vals[-1]:.1f})")
