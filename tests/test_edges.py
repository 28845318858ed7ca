import numpy as np
import jax.numpy as jnp

from pharmaforge_tpu.models.edges import (
    build_edge_bundle,
    full_edge_data,
    gathered_edge_data,
    knn_neighbor_list,
    scatter_transpose_mask,
)
from pharmaforge_tpu.ops.neighbors import knn_mask, radius_neighbor_list


def test_gathered_matches_full_geometry(rng):
    """Gathered-edge geometry must equal the full-pair geometry at the
    gathered indices."""
    dst = jnp.asarray(rng.normal(scale=4, size=(2, 6, 3)).astype(np.float32))
    src = jnp.asarray(rng.normal(scale=4, size=(2, 20, 3)).astype(np.float32))
    mask_d = jnp.ones((2, 6), bool)
    mask_s = jnp.ones((2, 20), bool)
    nbrs = knn_neighbor_list(dst, mask_d, src, mask_s, 4)
    g = gathered_edge_data(dst, src, nbrs)
    f = full_edge_data(dst, src, jnp.ones((2, 6, 20), bool))
    idx = np.asarray(nbrs.idx)
    for b in range(2):
        for i in range(6):
            for kk in range(4):
                j = idx[b, i, kk]
                np.testing.assert_allclose(np.asarray(g.x_dir)[b, i, kk],
                                           np.asarray(f.x_dir)[b, i, j],
                                           atol=1e-6)
                np.testing.assert_allclose(np.asarray(g.d_rbf)[b, i, kk],
                                           np.asarray(f.d_rbf)[b, i, j],
                                           atol=1e-6)


def test_knn_list_agrees_with_knn_mask(rng):
    dst = jnp.asarray(rng.normal(scale=4, size=(1, 5, 3)).astype(np.float32))
    src = jnp.asarray(rng.normal(scale=4, size=(1, 30, 3)).astype(np.float32))
    md = jnp.ones((1, 5), bool)
    ms = jnp.asarray(rng.random((1, 30)) > 0.3)
    k = 4
    nbrs = knn_neighbor_list(dst, md, src, ms, k)
    dense = np.asarray(knn_mask(dst, md, src, ms, k))
    sel = scatter_transpose_mask(nbrs.idx, nbrs.mask, 30)
    np.testing.assert_array_equal(np.asarray(sel), np.swapaxes(dense, 1, 2))


def test_bundle_knn_vs_radius_shapes(rng):
    pharm_x = jnp.asarray(rng.normal(scale=2, size=(2, 8, 3)).astype(np.float32))
    prot_x = jnp.asarray(rng.normal(scale=5, size=(2, 24, 3)).astype(np.float32))
    pm = jnp.ones((2, 8), bool)
    rm = jnp.ones((2, 24), bool)
    pp = radius_neighbor_list(prot_x, rm, 3.5, 8)
    cutoffs = {"ff": 9.0, "pf": 8.0, "pp": 3.5}

    b_knn = build_edge_bundle(pharm_x, pm, prot_x, rm, cutoffs, ff_k=0,
                              pf_k=5, pp_nbrs=pp)
    assert b_knn["pf"].idx is not None
    assert b_knn["pf"].mask.shape == (2, 8, 5)
    # fp edges are exactly the reverse pf pairs, carried on the narrow
    # pf layout (ReverseEdgeData) with shared geometry
    from pharmaforge_tpu.models.edges import ReverseEdgeData
    fp = b_knn["fp"]
    assert isinstance(fp, ReverseEdgeData)
    assert fp.n_dst == 24
    np.testing.assert_array_equal(np.asarray(fp.idx),
                                  np.asarray(b_knn["pf"].idx))
    np.testing.assert_array_equal(np.asarray(fp.mask),
                                  np.asarray(b_knn["pf"].mask))
    np.testing.assert_allclose(np.asarray(fp.x_dir),
                               -np.asarray(b_knn["pf"].x_dir))
    np.testing.assert_array_equal(np.asarray(fp.d_rbf),
                                  np.asarray(b_knn["pf"].d_rbf))

    b_rad = build_edge_bundle(pharm_x, pm, prot_x, rm, cutoffs, ff_k=0,
                              pf_k=0, pp_nbrs=pp)
    assert b_rad["pf"].idx is None
    assert b_rad["pf"].mask.shape == (2, 8, 24)
    np.testing.assert_array_equal(
        np.asarray(b_rad["fp"].mask),
        np.swapaxes(np.asarray(b_rad["pf"].mask), 1, 2))
