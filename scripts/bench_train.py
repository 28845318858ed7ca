"""Training-throughput benchmark: CrossDocked train steps/sec.

The second driver-designated metric (BASELINE.md). Runs the jitted
data-parallel train step on dev-config shapes over the local mesh and
prints one JSON line. bench.py at the repo root remains the headline
(samples/sec) benchmark.
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--pocket_atoms", type=int, default=230)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--steps_per_call", type=int, default=8,
                   help="train steps scanned inside one device call "
                        "(amortizes the per-call dispatch round-trip; "
                        "1 = the plain single-step path)")
    p.add_argument("--matmul_precision", default="float32",
                   choices=["float32", "tensorfloat32", "bfloat16"])
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    import jax

    from pharmaforge_tpu.utils.misc import setup_jax

    setup_jax()  # compile cache + honor JAX_PLATFORMS (CPU smoke runs)
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    from pharmaforge_tpu.data.batch import bucket_size, collate_complexes
    from pharmaforge_tpu.models.diffusion import (
        DiffusionConfig,
        PharmacophoreDiffusion,
    )
    from pharmaforge_tpu.parallel.mesh import (
        make_mesh, pad_batch_to_multiple, replicate, shard_batch)
    from pharmaforge_tpu.training.optim import make_optimizer
    from pharmaforge_tpu.training.train_state import TrainState, make_train_step

    cfg = DiffusionConfig(n_timesteps=100, n_convs=2, n_hidden_scalars=128,
                          vector_size=16, message_norm="mean",
                          n_message_gvps=3, n_update_gvps=2, n_noise_gvps=4,
                          pf_k=5, dropout=0.1, pp_k_max=16,
                          compute_dtype=args.compute_dtype)
    model = PharmacophoreDiffusion(cfg)

    rng = np.random.default_rng(0)
    p_pad = bucket_size(args.pocket_atoms)
    samples = []
    for _ in range(args.batch_size):
        n_prot = args.pocket_atoms
        dirs = rng.normal(size=(n_prot, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        prot_x = (dirs * rng.uniform(4, 12, (n_prot, 1))).astype(np.float32)
        n_ph = int(rng.integers(4, 9))
        samples.append({
            "prot_x": prot_x,
            "prot_h": np.eye(11, dtype=np.float32)[
                rng.integers(0, 11, n_prot)],
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

    k = max(1, args.steps_per_call)
    if k > 1:
        from pharmaforge_tpu.data.batch import stack_batches
        from pharmaforge_tpu.parallel.mesh import shard_stacked_batch
        from pharmaforge_tpu.training.train_state import make_multi_train_step
        stacked = shard_stacked_batch(stack_batches([batch] * k), mesh)
        step_fn = make_multi_train_step(model, optimizer, donate=True)
        run_batch = stacked
    else:
        step_fn = make_train_step(model, optimizer, donate=True)
        run_batch = batch
    n_calls = max(1, args.steps // k)

    from pharmaforge_tpu.utils.timing import fence

    state, aux = step_fn(state, run_batch, jax.random.key(1), 1e-3)
    fence(aux["train total loss"])

    rates = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        for i in range(n_calls):
            state, aux = step_fn(
                state, run_batch, jax.random.key(2 + r * n_calls + i), 1e-3)
        fence(aux["train total loss"])
        rates.append(n_calls * k / (time.perf_counter() - t0))

    print(json.dumps({
        "metric": "CrossDocked train steps/sec",
        "value": round(float(np.median(rates)), 3),
        "unit": "steps/sec",
        "min": round(min(rates), 3),
        "max": round(max(rates), 3),
        "steps_per_call": k,
        "batch_size": args.batch_size,
        "n_chips": jax.device_count(),
    }))


if __name__ == "__main__":
    main()
