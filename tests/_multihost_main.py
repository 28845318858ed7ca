"""Worker body: REAL 2-process jax.distributed data-parallel train step.

Until round 3 the multi-host path (`process_local_rows`,
`assemble_from_process_local`, mesh.py) had only single-process-equivalence
pinning; this worker actually runs under `jax.distributed.initialize` with
a local coordination service — 2 processes x 4 virtual CPU devices — and
executes one sharded train step end-to-end through that path:

* each process loads ONLY its `process_local_rows` slice of the global
  batch (the multi-host loader contract),
* `shard_batch`/`replicate` take their `jax.make_array_from_process_local_data`
  branches (no cross-host array transfers),
* the jitted train step runs SPMD over both processes, gradients
  all-reduced across the DCN-analog boundary,
* the resulting loss is printed for comparison against the single-process
  run of the same (params, batch, key), and
* the non-contiguous-mesh error path (mesh.py) is exercised for real
  (a process's devices interleaved in mesh order must raise).

Launched by tests/test_multihost.py with --process_id 0/1 and a shared
coordinator address.
"""

import argparse
import os


def build_setup():
    """Deterministic (model, batch): identical on every process."""
    import numpy as np

    from pharmaforge_tpu.data.batch import PharmComplexBatch
    from pharmaforge_tpu.models.diffusion import (
        DiffusionConfig,
        PharmacophoreDiffusion,
    )

    cfg = DiffusionConfig(n_timesteps=6, vector_size=4, n_convs=1,
                          n_hidden_scalars=16, n_message_gvps=1,
                          n_update_gvps=1, n_noise_gvps=1, pf_k=4,
                          pp_k_max=8)
    model = PharmacophoreDiffusion(cfg)

    rng = np.random.default_rng(7)
    b, f, p = 16, 8, 32
    pharm_mask = np.zeros((b, f), bool)
    prot_mask = np.zeros((b, p), bool)
    for i in range(b):
        pharm_mask[i, :3 + i % 5] = True
        prot_mask[i, :24 + i % 8] = True
    pharm_x = rng.normal(scale=3.0, size=(b, f, 3)).astype(np.float32)
    pharm_h = np.eye(6, dtype=np.float32)[rng.integers(0, 6, (b, f))]
    prot_x = rng.normal(scale=6.0, size=(b, p, 3)).astype(np.float32)
    prot_h = np.eye(11, dtype=np.float32)[rng.integers(0, 11, (b, p))]
    batch = PharmComplexBatch(
        pharm_x=pharm_x * pharm_mask[..., None],
        pharm_h=pharm_h * pharm_mask[..., None],
        pharm_mask=pharm_mask,
        prot_x=prot_x * prot_mask[..., None],
        prot_h=prot_h * prot_mask[..., None],
        prot_mask=prot_mask)
    return model, batch


def run_reference_single_process():
    """Single-process loss on the full batch (called inline by the test)."""
    import jax
    import numpy as np

    from pharmaforge_tpu.training.optim import make_optimizer
    from pharmaforge_tpu.training.train_state import (TrainState,
                                                      make_train_step)

    model, batch = build_setup()
    params = jax.device_get(model.init_params(jax.random.key(0), batch))
    optimizer = make_optimizer(1e-3, weight_decay=1e-12)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=np.int32(0))
    train_step = make_train_step(model, optimizer, donate=False)
    state, aux = train_step(state, batch, jax.random.key(1), 1e-3)
    return float(aux["train total loss"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--coordinator", required=True)
    args = p.parse_args()

    flag = "--xla_force_host_platform_device_count=4"
    if flag not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flag).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pharmaforge_jax_cache")
    jax.config.update("jax_default_matmul_precision", "float32")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * args.num_processes

    import numpy as np

    from pharmaforge_tpu.parallel.mesh import (make_mesh, process_local_rows,
                                               replicate, shard_batch)
    from pharmaforge_tpu.training.optim import make_optimizer
    from pharmaforge_tpu.training.train_state import (TrainState,
                                                      make_train_step)

    model, batch = build_setup()
    mesh = make_mesh()
    params = jax.device_get(model.init_params(jax.random.key(0), batch))
    optimizer = make_optimizer(1e-3, weight_decay=1e-12)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=np.asarray(0, np.int32))
    state = replicate(state, mesh)

    # the multi-host loader contract: this process materializes ONLY its
    # contiguous slice of the global batch
    start, stop = process_local_rows(batch.batch_size, mesh)
    assert stop - start == batch.batch_size // args.num_processes
    local = jax.tree_util.tree_map(lambda x: np.asarray(x)[start:stop],
                                   batch)
    gbatch = shard_batch(local, mesh)
    print(f"MULTIHOST_ROWS {args.process_id} {start} {stop}", flush=True)

    train_step = make_train_step(model, optimizer, donate=False)
    state, aux = train_step(state, gbatch, jax.random.key(1), 1e-3)
    loss = float(aux["train total loss"])
    assert np.isfinite(loss)
    print(f"MULTIHOST_LOSS {loss:.10f}", flush=True)

    # contiguity error path: a mesh with this process's devices interleaved
    # (p0,p1,p0,p1,...) cannot map rows to a contiguous per-host slice
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    interleaved = [d for pair in zip(devs[:4], devs[4:]) for d in pair]
    from jax.sharding import Mesh
    bad = Mesh(np.array(interleaved), ("data",))
    try:
        process_local_rows(16, bad)
    except ValueError:
        print("MULTIHOST_CONTIG_OK", flush=True)
    else:
        raise SystemExit("expected ValueError for non-contiguous mesh")

    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
