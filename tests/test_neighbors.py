import numpy as np
import jax.numpy as jnp

from pharmaforge_tpu.ops.neighbors import (
    build_dynamic_edges,
    knn_mask,
    radius_mask,
    radius_neighbor_list,
)


def brute_radius(dst, src, dst_m, src_m, r, exclude_self=False):
    n, m = dst.shape[0], src.shape[0]
    out = np.zeros((n, m), bool)
    for i in range(n):
        for j in range(m):
            if not (dst_m[i] and src_m[j]):
                continue
            if exclude_self and i == j:
                continue
            out[i, j] = np.linalg.norm(dst[i] - src[j]) < r
    return out


def test_radius_mask_matches_bruteforce(rng):
    dst = rng.normal(scale=4, size=(1, 12, 3)).astype(np.float32)
    src = rng.normal(scale=4, size=(1, 20, 3)).astype(np.float32)
    dst_m = rng.random((1, 12)) > 0.2
    src_m = rng.random((1, 20)) > 0.2
    got = np.asarray(radius_mask(jnp.asarray(dst), jnp.asarray(dst_m),
                                 jnp.asarray(src), jnp.asarray(src_m), 5.0))
    want = brute_radius(dst[0], src[0], dst_m[0], src_m[0], 5.0)
    np.testing.assert_array_equal(got[0], want)


def test_radius_mask_excludes_self(rng):
    x = rng.normal(scale=2, size=(1, 8, 3)).astype(np.float32)
    m = np.ones((1, 8), bool)
    got = np.asarray(radius_mask(jnp.asarray(x), jnp.asarray(m),
                                 jnp.asarray(x), jnp.asarray(m), 100.0,
                                 exclude_self=True))
    assert not got[0].diagonal().any()
    assert got[0].sum() == 8 * 7


def test_knn_mask_selects_nearest(rng):
    dst = rng.normal(scale=4, size=(1, 5, 3)).astype(np.float32)
    src = rng.normal(scale=4, size=(1, 30, 3)).astype(np.float32)
    dst_m = np.ones((1, 5), bool)
    src_m = rng.random((1, 30)) > 0.3
    k = 4
    got = np.asarray(knn_mask(jnp.asarray(dst), jnp.asarray(dst_m),
                              jnp.asarray(src), jnp.asarray(src_m), k))
    for i in range(5):
        d = np.linalg.norm(dst[0, i] - src[0], axis=-1)
        d[~src_m[0]] = np.inf
        want = np.zeros(30, bool)
        want[np.argsort(d)[:k]] = True
        want &= src_m[0]
        np.testing.assert_array_equal(got[0, i], want)


def test_knn_mask_fewer_valid_than_k(rng):
    dst = rng.normal(size=(1, 3, 3)).astype(np.float32)
    src = rng.normal(size=(1, 10, 3)).astype(np.float32)
    src_m = np.zeros((1, 10), bool)
    src_m[0, :2] = True
    got = np.asarray(knn_mask(jnp.asarray(dst), jnp.ones((1, 3), bool),
                              jnp.asarray(src), jnp.asarray(src_m), 5))
    assert (got.sum(-1) == 2).all()


def test_radius_neighbor_list(rng):
    x = rng.normal(scale=3, size=(1, 16, 3)).astype(np.float32)
    m = np.ones((1, 16), bool)
    m[0, -3:] = False
    r = 4.0
    nl = radius_neighbor_list(jnp.asarray(x), jnp.asarray(m), r, k_max=8)
    idx, mask = np.asarray(nl.idx), np.asarray(nl.mask)
    want = brute_radius(x[0], x[0], m[0], m[0], r, exclude_self=True)
    for i in range(16):
        sel = set(idx[0, i][mask[0, i]].tolist())
        true_nbrs = set(np.nonzero(want[i])[0].tolist())
        if len(true_nbrs) <= 8:
            assert sel == true_nbrs
        else:
            assert sel <= true_nbrs and len(sel) == 8


def test_build_dynamic_edges_fp_is_pf_transposed(rng):
    pharm_x = jnp.asarray(rng.normal(scale=2, size=(2, 8, 3)).astype(np.float32))
    prot_x = jnp.asarray(rng.normal(scale=5, size=(2, 24, 3)).astype(np.float32))
    pharm_m = jnp.asarray(rng.random((2, 8)) > 0.3)
    prot_m = jnp.asarray(rng.random((2, 24)) > 0.2)
    cutoffs = {"ff": 9.0, "pf": 8.0}
    for pf_k in (0, 5):
        edges = build_dynamic_edges(pharm_x, pharm_m, prot_x, prot_m,
                                    cutoffs, ff_k=0, pf_k=pf_k)
        np.testing.assert_array_equal(
            np.asarray(edges.fp), np.swapaxes(np.asarray(edges.pf), 1, 2))
        assert not np.asarray(edges.ff)[0].diagonal().any()


def test_smallest_k_matches_top_k():
    """k-pass extraction == lax.top_k(-d2, k) including tie order and the
    exhausted-slot sentinel behavior, across small and large k."""
    import jax.numpy as jnp
    from jax import lax
    from pharmaforge_tpu.ops.neighbors import smallest_k, _BIG

    rng = np.random.default_rng(11)
    d2 = rng.uniform(0.0, 10.0, size=(3, 7, 33)).astype(np.float32)
    # plant exact ties and invalid sentinels
    d2[0, 0, 5] = d2[0, 0, 9] = 1.25
    d2[1, 2, :] = _BIG
    d2[2, 3, 20:] = _BIG
    d2 = jnp.asarray(d2)
    for k in (1, 4, 8, 12):
        v, i = smallest_k(d2, k)
        ref_nv, ref_i = lax.top_k(-d2, min(k, 33))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
        np.testing.assert_allclose(np.asarray(v), -np.asarray(ref_nv))
