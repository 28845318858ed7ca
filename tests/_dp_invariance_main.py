"""Subprocess body for the DP-invariance test (VERDICT r1 #5).

Runs ONE train step + one eval step on the same batch over a 1-device and
an 8-device mesh and prints the max deviations. Data parallelism must be a
pure performance transform: identical losses and (within float tolerance)
identical updated parameters.

Run with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=8.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/pharmaforge_jax_cache")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np

from pharmaforge_tpu.models.diffusion import (
    DiffusionConfig,
    PharmacophoreDiffusion,
)
from pharmaforge_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pharmaforge_tpu.training.optim import make_optimizer
from pharmaforge_tpu.training.train_state import (
    TrainState,
    make_eval_step,
    make_train_step,
)
from tests.conftest import make_complex_batch


def main():
    assert len(jax.devices()) >= 8, "need 8 virtual devices"
    rng = np.random.default_rng(0)
    batch = make_complex_batch(rng, b=8, f=8, p=32,
                               f_valid=(5, 3, 4, 6), p_valid=(30, 24, 28, 20))
    cfg = DiffusionConfig(n_timesteps=10, vector_size=4, n_convs=1,
                          n_hidden_scalars=16, n_message_gvps=1,
                          n_update_gvps=1, n_noise_gvps=1, pf_k=4)
    model = PharmacophoreDiffusion(cfg)
    params = model.init_params(jax.random.key(0), batch)
    optimizer = make_optimizer(1e-3)
    key = jax.random.key(7)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        state = TrainState(params=params,
                           opt_state=optimizer.init(params),
                           step=np.int32(0))
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        train_step = make_train_step(model, optimizer, donate=False)
        eval_step = make_eval_step(model)
        new_state, aux = train_step(state, sharded, key, 1e-3)
        val = eval_step(new_state.params, sharded, jax.random.key(9))
        results[n_dev] = (
            float(aux["train total loss"]),
            jax.device_get(new_state.params),
            float(val["val total loss"]),
        )

    loss1, p1, v1 = results[1]
    loss8, p8, v8 = results[8]
    dloss = abs(loss1 - loss8)
    dval = abs(v1 - v8)
    dparams = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p8)))
    print(f"dp_invariance loss_dev={dloss:.3e} params_dev={dparams:.3e} "
          f"val_dev={dval:.3e}")
    assert dloss < 1e-5, dloss
    assert dparams < 1e-5, dparams
    assert dval < 1e-5, dval
    print("dp_invariance OK")


if __name__ == "__main__":
    main()
