"""Sampling-chain performance ablation on the real chip.

Times the jitted reverse-diffusion scan across axis sweeps (pocket size,
neighbor-list width, batch, matmul precision) to localize where the
per-step milliseconds go. Run directly: python scripts/perf_ablation.py
"""

import argparse
import time

import numpy as np


def time_chain(model, batch, repeats=3):
    import jax
    sampler = jax.jit(lambda p, b, k: model.sample_given_receptor(p, b, k))
    params = model.init_params(jax.random.key(0), batch)
    from pharmaforge_tpu.utils.timing import fence
    out = sampler(params, batch, jax.random.key(1))
    fence(out["pharm_x"])
    t0 = time.perf_counter()
    outs = [sampler(params, batch, jax.random.key(2 + r))
            for r in range(repeats)]
    fence([o["pharm_x"] for o in outs])
    dt = (time.perf_counter() - t0) / repeats
    return dt


def make_batch(b, p, seed=0):
    from pharmaforge_tpu.data.batch import tile_pocket
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(p, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    prot_x = (dirs * rng.uniform(4, 12, (p, 1))).astype(np.float32)
    prot_h = np.eye(11, dtype=np.float32)[rng.integers(0, 11, p)]
    sizes = rng.integers(3, 9, b)
    return tile_pocket(prot_x, prot_h, sizes, prot_bucket_multiple=p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bfloat16")
    args = ap.parse_args()

    import jax

    from pharmaforge_tpu.utils.misc import setup_jax

    setup_jax()  # compile cache + honor JAX_PLATFORMS (CPU smoke runs)
    jax.config.update("jax_default_matmul_precision", args.precision)

    from pharmaforge_tpu.models.diffusion import (
        DiffusionConfig,
        PharmacophoreDiffusion,
    )

    base = dict(n_timesteps=100, n_convs=2, n_hidden_scalars=128,
                vector_size=16, message_norm="mean", n_message_gvps=3,
                n_update_gvps=2, n_noise_gvps=4, pf_k=5, pp_k_max=16)

    variants = [
        ("bf16 B=32 K=16", dict(compute_dtype="bfloat16"), (32, 256)),
        ("bf16 B=48", dict(compute_dtype="bfloat16"), (48, 256)),
        ("bf16 B=64", dict(compute_dtype="bfloat16"), (64, 256)),
        ("bf16 K=12", dict(compute_dtype="bfloat16", pp_k_max=12), (32, 256)),
        ("pp cutoff off", dict(compute_dtype="bfloat16",
                               graph_cutoffs=(("pp", 0.0), ("pf", 8.0),
                                              ("fp", 8.0), ("ff", 9.0)),
                               pp_k_max=1), (32, 256)),
        ("pf radius (full mask)", dict(compute_dtype="bfloat16", pf_k=0),
         (32, 256)),
    ]

    results = {}
    for name, overrides, (b, p) in variants:
        cfg = DiffusionConfig(**{**base, **overrides})
        model = PharmacophoreDiffusion(cfg)
        batch = make_batch(b, p)
        dt = time_chain(model, batch)
        per_step_ms = dt / cfg.n_timesteps * 1000
        results[name] = (dt, per_step_ms, b / dt)
        print(f"{name:24s} chain {dt*1000:8.1f} ms | {per_step_ms:6.2f} ms/step"
              f" | {b/dt:8.1f} samples/s")
    return results


if __name__ == "__main__":
    main()
