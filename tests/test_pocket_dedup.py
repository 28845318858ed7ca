"""Pocket-copy dedup of the prot-prot message work.

Batched sampling tiles ONE pocket over the batch (tile_pocket, the dense
analog of reference copy_graph, unorganized_utils.py:28-81). The first
conv's prot-prot messages depend only on (prot_h, t, static pp geometry) —
identical across copies — so `pocket_group_size` computes them once per
group and broadcasts. These tests pin the claim that the grouped path is
numerically identical to the ungrouped one, end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.data.batch import tile_pocket
from pharmaforge_tpu.models.diffusion import (
    DiffusionConfig,
    PharmacophoreDiffusion,
)


def tiny_config(**kw):
    defaults = dict(n_timesteps=6, n_convs=2, vector_size=8,
                    n_hidden_scalars=32, message_norm="mean",
                    n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                    pf_k=4, pp_k_max=8)
    defaults.update(kw)
    return DiffusionConfig(**defaults)


def make_tiled_batch(rng, b=6, p=40):
    prot_x = rng.normal(scale=6.0, size=(p, 3)).astype(np.float32)
    prot_h = np.eye(11, dtype=np.float32)[rng.integers(0, 11, p)]
    sizes = rng.integers(3, 9, b)
    return tile_pocket(prot_x, prot_h, sizes)


@pytest.mark.parametrize("message_norm", ["mean", 0, 10])
def test_grouped_chain_matches_ungrouped(message_norm):
    """Full reverse chain: pocket_group_size=B vs =1, same key."""
    rng = np.random.default_rng(0)
    batch = make_tiled_batch(rng)
    model = PharmacophoreDiffusion(tiny_config(message_norm=message_norm))
    params = model.init_params(jax.random.key(0), batch)
    key = jax.random.key(1)

    ref = model.sample_given_receptor(params, batch, key,
                                      pocket_group_size=1)
    ded = model.sample_given_receptor(params, batch, key,
                                      pocket_group_size=batch.batch_size)
    np.testing.assert_allclose(np.asarray(ded["pharm_x"]),
                               np.asarray(ref["pharm_x"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ded["pharm_h"]),
                               np.asarray(ref["pharm_h"]),
                               rtol=1e-4, atol=1e-5)


def test_subgroup_layout():
    """Two distinct pockets, each tiled 3x, concatenated: group size 3."""
    rng = np.random.default_rng(1)
    a = make_tiled_batch(rng, b=3, p=32)
    b = make_tiled_batch(rng, b=3, p=32)
    both = jax.tree_util.tree_map(
        lambda x, y: np.concatenate([x, y], axis=0), a, b)
    model = PharmacophoreDiffusion(tiny_config())
    params = model.init_params(jax.random.key(0), both)
    key = jax.random.key(2)
    ref = model.sample_given_receptor(params, both, key, pocket_group_size=1)
    ded = model.sample_given_receptor(params, both, key, pocket_group_size=3)
    np.testing.assert_allclose(np.asarray(ded["pharm_x"]),
                               np.asarray(ref["pharm_x"]),
                               rtol=1e-4, atol=1e-5)


def test_rejects_bad_group():
    rng = np.random.default_rng(2)
    batch = make_tiled_batch(rng, b=5)
    model = PharmacophoreDiffusion(tiny_config())
    params = model.init_params(jax.random.key(0), batch)
    with pytest.raises(ValueError, match="not divisible"):
        model.sample_given_receptor(params, batch, jax.random.key(1),
                                    pocket_group_size=4)


def test_sampler_uses_dedup_and_matches_direct():
    """PocketSampler output is identical to the direct ungrouped chain."""
    from pharmaforge_tpu.training.sampling import PocketSampler

    rng = np.random.default_rng(3)
    p = 40
    pocket = {
        "prot_x": rng.normal(scale=6.0, size=(p, 3)).astype(np.float32),
        "prot_h": np.eye(11, dtype=np.float32)[rng.integers(0, 11, p)],
    }
    model = PharmacophoreDiffusion(tiny_config())
    sizes = [4, 6, 3, 8]
    batch = tile_pocket(pocket["prot_x"], pocket["prot_h"], sizes)
    params = model.init_params(jax.random.key(0), batch)

    sampler = PocketSampler(model, params)
    phs = sampler.sample_pocket(pocket, sizes, jax.random.key(7))
    assert len(phs) == len(sizes)
    for ph, sz in zip(phs, sizes):
        assert ph.ph_coords.shape == (sz, 3)
        assert np.isfinite(ph.ph_coords).all()


def test_sample_stacked_matches_direct_chain():
    """sample_stacked == the direct grouped chain on the same stacked batch."""
    from pharmaforge_tpu.training.sampling import PocketSampler

    rng = np.random.default_rng(4)

    def pocket(seed):
        r = np.random.default_rng(seed)
        return {
            "prot_x": r.normal(scale=6.0, size=(36, 3)).astype(np.float32),
            "prot_h": np.eye(11, dtype=np.float32)[r.integers(0, 11, 36)],
        }

    pockets = [pocket(0), pocket(1)]
    sizes = [[4, 6, 3], [5, 8, 3]]
    model = PharmacophoreDiffusion(tiny_config())
    tiles = [tile_pocket(p["prot_x"], p["prot_h"], s, max_prot=64)
             for p, s in zip(pockets, sizes)]
    batch = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *tiles)
    params = model.init_params(jax.random.key(0), batch)

    sampler = PocketSampler(model, params, fixed_prot_slots=64)
    key = jax.random.key(9)
    per_pocket = sampler.sample_stacked(pockets, sizes, key)
    assert [len(p) for p in per_pocket] == [3, 3]

    pm = batch.prot_mask[::3][..., None]
    coms = ((batch.prot_x[::3] * pm).sum(1)
            / np.maximum(pm.sum(1), 1)).astype(np.float32)
    com = np.repeat(coms, 3, axis=0)
    direct = model.sample_given_receptor(params, batch, key,
                                         init_pharm_com=com,
                                         pocket_group_size=3)
    direct_x = np.asarray(direct["pharm_x"])
    for i, phs in enumerate(per_pocket):
        for j, ph in enumerate(phs):
            n = len(sizes[i][j] * [0])
            row = direct_x[i * 3 + j][:sizes[i][j]]
            # jitted (PocketSampler) vs eager (direct call) can fuse the
            # scan body differently -> tolerate ~1e-6 abs drift
            np.testing.assert_allclose(ph.ph_coords, row, rtol=1e-4,
                                       atol=1e-5)


def test_sample_multi_pocket_uses_stacked_path():
    """PocketSampler.sample with equal per-pocket counts routes through the
    stacked single-call path and returns well-formed pharmacophores."""
    from pharmaforge_tpu.training.sampling import PocketSampler

    def pocket(seed):
        r = np.random.default_rng(seed)
        return {
            "prot_x": r.normal(scale=6.0, size=(30, 3)).astype(np.float32),
            "prot_h": np.eye(11, dtype=np.float32)[r.integers(0, 11, 30)],
        }

    model = PharmacophoreDiffusion(tiny_config())
    pockets = [pocket(1), pocket(2), pocket(3)]
    sizes = [[4, 5], [3, 8], [6, 6]]
    batch = tile_pocket(pockets[0]["prot_x"], pockets[0]["prot_h"], [4, 5],
                        max_prot=64)
    params = model.init_params(jax.random.key(0), batch)
    sampler = PocketSampler(model, params, fixed_prot_slots=64)
    out = sampler.sample(pockets, sizes, jax.random.key(2))
    assert [len(p) for p in out] == [2, 2, 2]
    for phs, szs in zip(out, sizes):
        for ph, sz in zip(phs, szs):
            assert ph.ph_coords.shape == (sz, 3)
            assert np.isfinite(ph.ph_coords).all()


def test_chunked_sampling_honors_per_chunk_sizes(rng):
    """samples_per_pocket > max_batch_size: each chunk must use ITS slice
    of pharm_sizes. The reference reuses the first batch_size entries for
    every chunk (generate_pharmacophores.py:329-333) — a bug we fix, not
    reproduce."""
    import jax
    from pharmaforge_tpu.models.diffusion import (DiffusionConfig,
                                                  PharmacophoreDiffusion)
    from pharmaforge_tpu.training.sampling import PocketSampler
    from pharmaforge_tpu.data.batch import tile_pocket

    cfg = DiffusionConfig(n_timesteps=4, n_convs=1, vector_size=4,
                          n_hidden_scalars=16, n_message_gvps=1,
                          n_update_gvps=1, n_noise_gvps=1, pf_k=4,
                          pp_k_max=8)
    model = PharmacophoreDiffusion(cfg)
    n_prot = 30
    prot_x = rng.normal(scale=6.0, size=(n_prot, 3)).astype("float32")
    prot_h = (rng.integers(0, 11, n_prot)[:, None]
              == range(11)).astype("float32")
    pocket = {"prot_x": prot_x, "prot_h": prot_h}
    init = tile_pocket(prot_x, prot_h, [3, 4], max_prot=64)
    params = model.init_params(jax.random.key(0), init)

    sizes = [3, 4, 5, 6, 7]
    sampler = PocketSampler(model, params, fixed_prot_slots=64)
    pharms = sampler.sample_pocket(pocket, sizes, jax.random.key(1),
                                   max_batch_size=2)
    assert [p.n_ph_centers for p in pharms] == sizes
