"""Fused pf knn-selection kernel: parity with the plain-XLA path.

The kernel must reproduce `smallest_k` + `gather_neighbor_coords` exactly —
indices (including tie order and exhausted-slot walk), distances, masks,
and gathered coordinates — since the selected edge SET determines the
denoising trajectory.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.ops.neighbors import (
    _BIG,
    gather_neighbor_coords,
    pairwise_sqdist,
    smallest_k,
)
from pharmaforge_tpu.ops.pallas.knn_select import (
    knn_select,
    knn_select_reference,
)


def make_inputs(rng, b=4, f=8, p=64):
    pharm_x = rng.normal(scale=3.0, size=(b, f, 3)).astype(np.float32)
    prot_x = rng.normal(scale=6.0, size=(b, p, 3)).astype(np.float32)
    pharm_mask = np.ones((b, f), bool)
    prot_mask = np.ones((b, p), bool)
    pharm_mask[0, 5:] = False
    prot_mask[1, 50:] = False
    prot_mask[2, 3:] = False   # fewer valid srcs than k
    return (jnp.asarray(pharm_x), jnp.asarray(pharm_mask),
            jnp.asarray(prot_x), jnp.asarray(prot_mask))


def xla_path(pharm_x, pharm_mask, prot_x, prot_mask, k):
    d2 = pairwise_sqdist(pharm_x, prot_x)
    valid = pharm_mask[..., :, None] & prot_mask[..., None, :]
    d2 = jnp.where(valid, d2, _BIG)
    d, idx = smallest_k(d2, k)
    xg = gather_neighbor_coords(prot_x, idx)
    return idx, d, xg


@pytest.mark.parametrize("k", [1, 5, 8])
def test_reference_matches_xla_path(rng, k):
    args = make_inputs(rng)
    idx_r, d_r, xg_r = knn_select_reference(*args, k)
    idx_x, d_x, xg_x = xla_path(*args, k)
    np.testing.assert_array_equal(np.asarray(idx_r), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_x))
    np.testing.assert_allclose(np.asarray(xg_r), np.asarray(xg_x))


def test_reference_with_planted_ties(rng):
    pharm_x, pharm_mask, prot_x, prot_mask = make_inputs(rng)
    prot_x = prot_x.at[0, 7].set(prot_x[0, 3])  # exact duplicate coordinate
    args = (pharm_x, pharm_mask, prot_x, prot_mask)
    idx_r, d_r, _ = knn_select_reference(*args, 5)
    idx_x, d_x, _ = xla_path(*args, 5)
    np.testing.assert_array_equal(np.asarray(idx_r), np.asarray(idx_x))


@pytest.mark.parametrize("k", [5])
def test_kernel_interpret_matches_reference(rng, k):
    args = make_inputs(rng)
    idx_k, d_k, xg_k = knn_select(*args, k, interpret=True)
    idx_r, d_r, xg_r = knn_select_reference(*args, k)
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_r))
    # distances may differ by ~1e-7 rel (FMA contraction choices); the
    # binding outputs — indices, masks, gathered coords — are exact
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xg_k), np.asarray(xg_r))


def test_kernel_interpret_odd_batch(rng):
    """Batch not divisible by the tile: falls back to tile_b=1."""
    args = make_inputs(rng, b=3)
    idx_k, d_k, xg_k = knn_select(*args, 4, interpret=True)
    idx_r, d_r, xg_r = knn_select_reference(*args, 4)
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(xg_k), np.asarray(xg_r))


def test_bundle_identical_with_and_without_kernel(rng, monkeypatch):
    """build_edge_bundle: kernel path (interpret) == plain path, all fields."""
    import pharmaforge_tpu.models.edges as edges_mod
    from pharmaforge_tpu.models.edges import build_edge_bundle
    from pharmaforge_tpu.ops.neighbors import build_pp_neighbors

    pharm_x, pharm_mask, prot_x, prot_mask = make_inputs(rng)
    pp = build_pp_neighbors(prot_x, prot_mask, 3.5, 8)
    cutoffs = {"pp": 3.5, "pf": 8.0, "fp": 8.0, "ff": 9.0}

    plain = build_edge_bundle(pharm_x, pharm_mask, prot_x, prot_mask,
                              cutoffs, ff_k=0, pf_k=5, pp_nbrs=pp)

    import pharmaforge_tpu.ops.pallas as pallas_pkg
    monkeypatch.setattr(pallas_pkg, "edge_kernel_enabled", lambda: True)
    import pharmaforge_tpu.ops.pallas.knn_select as ks
    real = ks.knn_select
    monkeypatch.setattr(
        ks, "knn_select",
        lambda *a, **kw: real(*a, **{**kw, "interpret": True}))
    fused = build_edge_bundle(pharm_x, pharm_mask, prot_x, prot_mask,
                              cutoffs, ff_k=0, pf_k=5, pp_nbrs=pp)

    for name in ("pf", "fp", "ff", "pp"):
        a, b = plain[name], fused[name]
        assert type(a) is type(b)
        for fa, fb in zip(a, b):
            if fa is None or isinstance(fa, int):
                assert fa == fb
                continue
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=1e-6, atol=1e-7, err_msg=name)


# ---------------------------------------------------------------- pp variant

def make_pp_inputs(rng, b=3, p=48):
    x = rng.normal(scale=4.0, size=(b, p, 3)).astype(np.float32)
    mask = np.ones((b, p), bool)
    mask[1, 40:] = False
    # a dense cluster so the radius cutoff actually truncates
    x[0, :10] *= 0.05
    return jnp.asarray(x), jnp.asarray(mask)


@pytest.mark.parametrize("k", [4, 16])
def test_pp_reference_matches_radius_list(rng, k):
    """exclude_self + cutoff variant == radius_neighbor_list + coord gather."""
    from pharmaforge_tpu.ops.neighbors import radius_neighbor_list
    x, mask = make_pp_inputs(rng)
    cutoff = 3.5
    idx_r, d_r, xg_r = knn_select_reference(x, mask, x, mask, k,
                                            exclude_self=True, cutoff=cutoff)
    nbrs = radius_neighbor_list(x, mask, cutoff, k)
    np.testing.assert_array_equal(np.asarray(idx_r), np.asarray(nbrs.idx))
    np.testing.assert_array_equal(np.asarray(d_r < _BIG),
                                  np.asarray(nbrs.mask))
    np.testing.assert_allclose(
        np.asarray(xg_r), np.asarray(gather_neighbor_coords(x, nbrs.idx)))


def test_pp_kernel_interpret_matches_reference(rng):
    x, mask = make_pp_inputs(rng)
    idx_k, d_k, xg_k = knn_select(x, mask, x, mask, 16, interpret=True,
                                  exclude_self=True, cutoff=3.5)
    idx_r, d_r, xg_r = knn_select_reference(x, mask, x, mask, 16,
                                            exclude_self=True, cutoff=3.5)
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_r))
    # the selected-distance VALUES may differ by an fma contraction between
    # the interpret-mode lowering and the jnp twin; selection (indices,
    # masks) and the gathered coords are what the model consumes, and those
    # are exact
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(d_k < _BIG), np.asarray(d_r < _BIG))
    np.testing.assert_allclose(np.asarray(xg_k), np.asarray(xg_r))


def test_pp_kernel_interpret_tiled(rng):
    """Tiled grid (tile_b < b) must match the whole-batch result."""
    x, mask = make_pp_inputs(rng, b=4)
    a = knn_select(x, mask, x, mask, 8, interpret=True, tile_b=2,
                   exclude_self=True, cutoff=3.5)
    bf = knn_select(x, mask, x, mask, 8, interpret=True, tile_b=4,
                    exclude_self=True, cutoff=3.5)
    for u, v in zip(a, bf):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_build_pp_edge_kernel_vs_plain(rng, monkeypatch):
    """build_pp_edge: kernel path (interpret) == plain path, all fields."""
    import pharmaforge_tpu.ops.pallas as pk
    import pharmaforge_tpu.ops.pallas.knn_select as ks
    from pharmaforge_tpu.models.edges import build_pp_edge

    x, mask = make_pp_inputs(rng)
    plain_nbrs, plain_ed = build_pp_edge(x, mask, 3.5, 16)

    real = ks.knn_select
    monkeypatch.setattr(pk, "edge_kernel_enabled", lambda: True)
    monkeypatch.setattr(ks, "knn_select",
                        lambda *a, **kw: real(*a, **{**kw, "interpret": True}))
    k_nbrs, k_ed = build_pp_edge(x, mask, 3.5, 16)

    np.testing.assert_array_equal(np.asarray(k_nbrs.idx),
                                  np.asarray(plain_nbrs.idx))
    np.testing.assert_array_equal(np.asarray(k_nbrs.mask),
                                  np.asarray(plain_nbrs.mask))
    np.testing.assert_allclose(np.asarray(k_ed.x_dir),
                               np.asarray(plain_ed.x_dir))
    np.testing.assert_allclose(np.asarray(k_ed.d_rbf),
                               np.asarray(plain_ed.d_rbf))
