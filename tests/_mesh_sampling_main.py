"""Subprocess body: mesh-sharded sampling == single-device sampling.

Runs the same pocket sweep through PocketSampler with mesh=None and with an
8-virtual-device mesh (same keys); sharding the sample rows over the 'data'
axis must be a pure performance transform. Covers both the per-pocket path
(sample_pocket with sharded copies) and the stacked multi-pocket path.

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
from pharmaforge_tpu.parallel.mesh import make_mesh
from pharmaforge_tpu.training.sampling import PocketSampler


def make_pocket(rng, n_prot):
    dirs = rng.normal(size=(n_prot, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    prot_x = (dirs * rng.uniform(4, 10, (n_prot, 1))).astype(np.float32)
    prot_h = np.eye(11, dtype=np.float32)[rng.integers(0, 11, n_prot)]
    return {"prot_x": prot_x, "prot_h": prot_h}


def main():
    assert len(jax.devices()) >= 8, "need 8 virtual devices"
    cfg = DiffusionConfig(n_timesteps=6, vector_size=4, n_convs=1,
                          n_hidden_scalars=16, n_message_gvps=1,
                          n_update_gvps=1, n_noise_gvps=1, pf_k=4,
                          pp_k_max=8)
    model = PharmacophoreDiffusion(cfg)
    rng = np.random.default_rng(3)
    pockets = [make_pocket(rng, n) for n in (40, 52)]
    sizes = [[4, 5, 6, 5, 4, 3, 6, 4], [5, 4, 3, 6, 4, 5, 3, 4]]

    from pharmaforge_tpu.data.batch import tile_pocket
    init_batch = tile_pocket(pockets[0]["prot_x"], pockets[0]["prot_h"],
                             sizes[0], n_pharm_feats=6, max_prot=64)
    params = model.init_params(jax.random.key(0), init_batch)

    ref = PocketSampler(model, params, fixed_prot_slots=64)
    mesh = make_mesh(8)
    par = PocketSampler(model, params, fixed_prot_slots=64, mesh=mesh)

    # per-pocket path: 8 sample copies shard 1/chip
    a = ref.sample_pocket(pockets[0], sizes[0], jax.random.key(7))
    b = par.sample_pocket(pockets[0], sizes[0], jax.random.key(7))
    assert len(a) == len(b) == 8
    for pa, pb in zip(a, b):
        np.testing.assert_allclose(pa.ph_coords, pb.ph_coords,
                                   rtol=0, atol=1e-5)
        assert pa.ph_types == pb.ph_types

    # stacked multi-pocket path (2 pockets is not divisible by 8 -> the
    # mesh sampler must still produce correct results via its fallback)
    a2 = ref.sample(pockets, sizes, jax.random.key(9))
    b2 = par.sample(pockets, sizes, jax.random.key(9))
    for la, lb in zip(a2, b2):
        for pa, pb in zip(la, lb):
            np.testing.assert_allclose(pa.ph_coords, pb.ph_coords,
                                       rtol=0, atol=1e-5)
            assert pa.ph_types == pb.ph_types

    # the multi-host assembly path must equal device_put single-process:
    # same sharding, same values, per-device shards intact
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pharmaforge_tpu.parallel.mesh import (assemble_from_process_local,
                                               process_local_rows,
                                               shard_batch)
    sharding = NamedSharding(mesh, P("data"))
    direct = shard_batch(init_batch, mesh)
    assembled = assemble_from_process_local(init_batch, sharding)
    for da, aa in zip(jax.tree_util.tree_leaves(direct),
                      jax.tree_util.tree_leaves(assembled)):
        assert da.sharding.is_equivalent_to(aa.sharding, da.ndim)
        np.testing.assert_array_equal(np.asarray(da), np.asarray(aa))
    assert process_local_rows(16, mesh) == (0, 16)  # single process: all

    print("mesh_sampling OK")


if __name__ == "__main__":
    main()
