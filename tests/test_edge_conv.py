import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.models.conv import GVPEdgeConv
from pharmaforge_tpu.models.edges import full_edge_data, gathered_edge_data, knn_neighbor_list
from tests.test_gvp import random_rotation


def make_inputs(rng, b=2, ns=14, nd=6, s=16, v=4):
    h_src = jnp.asarray(rng.normal(size=(b, ns, s)).astype(np.float32))
    v_src = jnp.asarray(rng.normal(size=(b, ns, v, 3)).astype(np.float32))
    x_src = jnp.asarray(rng.normal(scale=4, size=(b, ns, 3)).astype(np.float32))
    h_dst = jnp.asarray(rng.normal(size=(b, nd, s)).astype(np.float32))
    v_dst = jnp.asarray(rng.normal(size=(b, nd, v, 3)).astype(np.float32))
    x_dst = jnp.asarray(rng.normal(scale=4, size=(b, nd, 3)).astype(np.float32))
    dst_mask = jnp.asarray(np.array([[1] * 5 + [0], [1] * 4 + [0] * 2],
                                    bool))
    src_mask = jnp.ones((b, ns), bool)
    return (h_src, x_src, v_src), (h_dst, x_dst, v_dst), src_mask, dst_mask


@pytest.mark.parametrize("use_dst_feats", [False, True])
@pytest.mark.parametrize("gathered", [False, True])
def test_edge_conv_shapes_and_equivariance(rng, use_dst_feats, gathered):
    src, dst, src_mask, dst_mask = make_inputs(rng)
    if gathered:
        nbrs = knn_neighbor_list(dst[1], dst_mask, src[1], src_mask, 4)
        edge = gathered_edge_data(dst[1], src[1], nbrs)
    else:
        mask = jnp.ones((2, 6, 14), bool) & dst_mask[..., None]
        edge = full_edge_data(dst[1], src[1], mask)

    conv = GVPEdgeConv(scalar_size=16, vector_size=4, n_message_gvps=2,
                       n_update_gvps=1, use_dst_feats=use_dst_feats,
                       message_norm="mean")
    params = conv.init(jax.random.key(0), src, dst, dst_mask, edge)
    h, v = conv.apply(params, src, dst, dst_mask, edge)
    assert h.shape == (2, 6, 16)
    assert v.shape == (2, 6, 4, 3)
    assert np.isfinite(np.asarray(h)).all()
    assert (np.asarray(h)[~np.asarray(dst_mask)] == 0).all()

    # rotate everything -> scalars invariant, vectors rotate
    rot = jnp.asarray(random_rotation(rng))
    src_r = (src[0], src[1] @ rot.T, src[2] @ rot.T)
    dst_r = (dst[0], dst[1] @ rot.T, dst[2] @ rot.T)
    if gathered:
        edge_r = gathered_edge_data(dst_r[1], src_r[1], nbrs)
    else:
        edge_r = full_edge_data(dst_r[1], src_r[1], edge.mask)
    h_r, v_r = conv.apply(params, src_r, dst_r, dst_mask, edge_r)
    np.testing.assert_allclose(np.asarray(h_r), np.asarray(h), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_r), np.asarray(v @ rot.T),
                               atol=2e-4)
