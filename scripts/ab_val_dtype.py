"""Interleaved A/B: full-scale VALIDATION step cost, f32 vs bf16 compute.

VERDICT r4 #8: validation at full scale runs the fused pp kernel's f32
regime (halved tiles, ops/pallas/pp_message.py::_auto_tile) every epoch,
and that regime had no committed measurement. This times `make_eval_step`
(the trainer's exact val step: dropout off, fresh diffusion noise,
training/train_state.py:110-117) at the full-scale shape under
compute_dtype=float32 (the training CLI's default) vs bfloat16, one
process, alternating repeats (cross-process timings drift — skills/verify).

  AB_REPEATS=4 AB_CALLS=8 python -m scripts.ab_val_dtype
"""

import os
import time

import numpy as np

from pharmaforge_tpu.utils.misc import setup_jax

setup_jax()

import jax  # noqa: E402

from pharmaforge_tpu.data.batch import bucket_size, collate_complexes  # noqa: E402
from pharmaforge_tpu.data.synthetic import make_synthetic_pocket  # noqa: E402
from pharmaforge_tpu.models.diffusion import (DiffusionConfig,  # noqa: E402
                                              PharmacophoreDiffusion)
from pharmaforge_tpu.training.train_state import make_eval_step  # noqa: E402
from pharmaforge_tpu.utils.timing import fence  # noqa: E402

REPEATS = int(os.environ.get("AB_REPEATS", "4"))
N_CALLS = int(os.environ.get("AB_CALLS", "8"))
N_CONVS = int(os.environ.get("AB_CONVS", "4"))
BATCH, ATOMS = 32, 230


def build(compute_dtype):
    cfg = DiffusionConfig(n_timesteps=1000, n_convs=N_CONVS,
                          n_hidden_scalars=128, vector_size=16,
                          message_norm="mean", n_message_gvps=3,
                          n_update_gvps=2, n_noise_gvps=4, pf_k=5,
                          dropout=0.1, pp_k_max=16,
                          endpoint_param_feat=True,
                          endpoint_param_coord=True,
                          compute_dtype=compute_dtype)
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
    batch = jax.device_put(batch)
    params = model.init_params(jax.random.key(0), batch)
    return make_eval_step(model), params, batch


def main():
    variants = {"f32": build("float32"), "bf16": build("bfloat16")}
    for name, (fn, params, batch) in variants.items():
        t0 = time.perf_counter()
        aux = fn(params, batch, jax.random.key(1))
        fence(aux["val total loss"])
        print(f"{name}: compiled+step0 in {time.perf_counter()-t0:.1f}s, "
              f"val total loss {float(aux['val total loss']):.4f}",
              flush=True)

    rates = {"f32": [], "bf16": []}
    for r in range(REPEATS):
        for name in ("f32", "bf16") if r % 2 == 0 else ("bf16", "f32"):
            fn, params, batch = variants[name]
            t0 = time.perf_counter()
            for i in range(N_CALLS):
                aux = fn(params, batch, jax.random.key(100 + r * 31 + i))
            fence(aux["val total loss"])
            dt = time.perf_counter() - t0
            rates[name].append(N_CALLS / dt)
            print(f"r{r} {name}: {rates[name][-1]:.1f} val steps/s",
                  flush=True)

    meds = {}
    for name, rr in rates.items():
        meds[name] = float(np.median(rr))
        print(f"{name}: median {meds[name]:.1f} val steps/s "
              f"(spread {min(rr):.1f}-{max(rr):.1f}, "
              f"{1e3/meds[name]:.2f} ms/step @ batch {BATCH})", flush=True)
    print(f"bf16/f32 speedup: {meds['bf16']/meds['f32']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
