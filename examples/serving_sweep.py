"""Throughput-oriented serving sweep: the recipe behind the bench number.

Demonstrates how to drive the sampler the way a dataset evaluation or a
serving queue should on this hardware (see docs/performance.md):

* stack several DISTINCT pockets x N samples each into ONE device batch
  (`PocketSampler.sample_stacked` layout) — per-step ops are tiny at
  single-pocket batch sizes, stacking amortizes their fixed cost;
* enqueue several such calls back-to-back and block ONCE — async dispatch
  overlaps the per-call host/tunnel round-trip with device execution;
* keep pocket copies grouped so the chain dedups the prot-prot work and
  the prot encoder per pocket group (`pocket_group_size`).

Run with `python examples/serving_sweep.py` (tiny model on CPU by default;
on a TPU host it uses the chip and prints steady-state samples/sec).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pharmaforge_jax_cache")
if os.environ.get("JAX_PLATFORMS"):
    # honor the env var even on hosts whose site hook re-selects a TPU
    # plugin after import (see tests/conftest.py)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pharmaforge_tpu.data.batch import tile_pocket
from pharmaforge_tpu.models.diffusion import DiffusionConfig, PharmacophoreDiffusion

POCKETS_PER_CALL = 4      # 8 is the knee on v5e; 4 keeps this demo snappy
SAMPLES_PER_POCKET = 8
PIPELINE_DEPTH = 4

# tiny model so the demo compiles in seconds; swap for a trained config +
# restored params in real use (pharmaforge_tpu.training.restore.load_model)
config = DiffusionConfig(n_timesteps=10, n_convs=2, n_hidden_scalars=32,
                         vector_size=8, message_norm="mean",
                         n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                         pf_k=5, pp_k_max=16)
model = PharmacophoreDiffusion(config)


def make_pocket(seed, n_prot=64):
    r = np.random.default_rng(seed)
    dirs = r.normal(size=(n_prot, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return ((dirs * r.uniform(4, 12, (n_prot, 1))).astype(np.float32),
            np.eye(11, dtype=np.float32)[r.integers(0, 11, n_prot)])


# one stacked batch: pocket-major rows, SAMPLES_PER_POCKET copies per pocket
sizes = np.random.default_rng(0).integers(3, 9, SAMPLES_PER_POCKET)
tiles = [tile_pocket(*make_pocket(i), sizes) for i in range(POCKETS_PER_CALL)]
batch = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, 0), *tiles)
params = model.init_params(jax.random.key(0), batch)

sample = jax.jit(lambda p, b, k: model.sample_given_receptor(
    p, b, k, pocket_group_size=SAMPLES_PER_POCKET))

out = sample(params, batch, jax.random.key(1))          # compile + warm up
jax.block_until_ready(out["pharm_x"])

t0 = time.perf_counter()
outs = [sample(params, batch, jax.random.key(2 + i))    # enqueue, don't block
        for i in range(PIPELINE_DEPTH)]
jax.block_until_ready(outs[-1]["pharm_x"])              # one sync at the end
dt = time.perf_counter() - t0

n = batch.pharm_mask.shape[0] * PIPELINE_DEPTH
print(f"{n} pharmacophores in {dt:.2f}s -> {n / dt:.1f} samples/sec "
      f"({POCKETS_PER_CALL} pockets x {SAMPLES_PER_POCKET} samples/call, "
      f"depth {PIPELINE_DEPTH}, T={config.n_timesteps})")
assert np.isfinite(np.asarray(outs[-1]["pharm_x"])).all()
