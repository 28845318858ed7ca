"""Interleaved A/B: full-scale TRAIN step with the fused pp kernel
(fwd + Pallas backward, fused_pp='auto') vs the plain XLA path
(fused_pp=False).

One process, alternating repeats (cross-process timings on this tunnel
drift up to 2x — skills/verify). Shapes mirror bench.run_train_bench's
full-scale workload: n_convs=4, batch 32, 230-atom pockets, 8 scanned
steps/call, endpoint losses (VERDICT r4 #1's 'done' measurement).

  AB_REPEATS=4 AB_CALLS=3 python -m scripts.ab_train_fused
"""

import os
import time

import numpy as np

from pharmaforge_tpu.utils.misc import setup_jax

setup_jax()

import jax  # noqa: E402

from pharmaforge_tpu.data.batch import (bucket_size, collate_complexes,  # noqa: E402
                                        stack_batches)
from pharmaforge_tpu.data.synthetic import make_synthetic_pocket  # noqa: E402
from pharmaforge_tpu.models.diffusion import (DiffusionConfig,  # noqa: E402
                                              PharmacophoreDiffusion)
from pharmaforge_tpu.parallel.mesh import (make_mesh, pad_batch_to_multiple,  # noqa: E402
                                           replicate, shard_batch,
                                           shard_stacked_batch)
from pharmaforge_tpu.training.optim import make_optimizer  # noqa: E402
from pharmaforge_tpu.training.train_state import (TrainState,  # noqa: E402
                                                  make_multi_train_step)
from pharmaforge_tpu.utils.timing import fence  # noqa: E402

REPEATS = int(os.environ.get("AB_REPEATS", "4"))
N_CALLS = int(os.environ.get("AB_CALLS", "3"))
N_CONVS = int(os.environ.get("AB_CONVS", "4"))
BATCH, ATOMS, STEPS_PER_CALL = 32, 230, 8


def build(fused_pp):
    cfg = DiffusionConfig(n_timesteps=1000, n_convs=N_CONVS,
                          n_hidden_scalars=128, vector_size=16,
                          message_norm="mean", n_message_gvps=3,
                          n_update_gvps=2, n_noise_gvps=4, pf_k=5,
                          dropout=0.1, pp_k_max=16,
                          endpoint_param_feat=True, endpoint_param_coord=True,
                          fused_pp=fused_pp)
    model = PharmacophoreDiffusion(cfg)
    rng = np.random.default_rng(0)
    p_pad = bucket_size(ATOMS)
    samples = []
    for _ in range(BATCH):
        prot_x, p_elem = make_synthetic_pocket(rng, np.zeros(3), ATOMS)
        prot_x = prot_x.astype(np.float32)
        n_ph = int(rng.integers(4, 9))
        samples.append({
            "prot_x": prot_x,
            "prot_h": np.eye(11, dtype=np.float32)[p_elem],
            "pharm_x": prot_x[:n_ph] * 0.3,
            "pharm_h": np.eye(6, dtype=np.float32)[rng.integers(0, 6, n_ph)],
        })
    batch = collate_complexes(samples, max_prot=p_pad)
    mesh = make_mesh()
    optimizer = make_optimizer(1e-3, weight_decay=1e-12)
    params = model.init_params(jax.random.key(0), batch)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=np.int32(0))
    state = replicate(state, mesh)
    batch, _ = pad_batch_to_multiple(batch, int(np.prod(mesh.devices.shape)))
    batch = shard_batch(batch, mesh)
    stacked = shard_stacked_batch(
        stack_batches([batch] * STEPS_PER_CALL), mesh)
    step_fn = make_multi_train_step(model, optimizer, donate=True)
    return step_fn, state, stacked


def main():
    variants = {"fused": build("auto"), "plain": build(False)}
    # warm both (compile)
    states = {}
    for name, (fn, st, stacked) in variants.items():
        t0 = time.perf_counter()
        st, aux = fn(st, stacked, jax.random.key(1), 1e-3)
        fence(aux["train total loss"])
        print(f"{name}: compiled+step0 in {time.perf_counter()-t0:.1f}s",
              flush=True)
        states[name] = st

    rates = {"fused": [], "plain": []}
    for r in range(REPEATS):
        for name in ("fused", "plain") if r % 2 == 0 else ("plain", "fused"):
            fn, _, stacked = variants[name]
            st = states[name]
            t0 = time.perf_counter()
            for i in range(N_CALLS):
                st, aux = fn(st, stacked,
                             jax.random.key(100 + r * 31 + i), 1e-3)
            fence(aux["train total loss"])
            dt = time.perf_counter() - t0
            states[name] = st
            rates[name].append(N_CALLS * STEPS_PER_CALL / dt)
            print(f"r{r} {name}: {rates[name][-1]:.1f} steps/s", flush=True)

    for name, rr in rates.items():
        med = float(np.median(rr))
        print(f"{name}: median {med:.1f} steps/s "
              f"(spread {min(rr):.1f}-{max(rr):.1f}, "
              f"{1e3/med:.2f} ms/step @ batch {BATCH})", flush=True)
    print(f"speedup fused/plain: "
          f"{np.median(rates['fused'])/np.median(rates['plain']):.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
