import numpy as np
import jax
import jax.numpy as jnp

from pharmaforge_tpu.models.gvp import GVP, GVPLayerNorm, gvp_dropout


def random_rotation(rng):
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q.astype(np.float32)


def test_gvp_shapes_and_equivariance(rng):
    gvp = GVP(dim_vectors_in=5, dim_vectors_out=4, dim_feats_in=7,
              dim_feats_out=6)
    feats = jnp.asarray(rng.normal(size=(10, 7)).astype(np.float32))
    vecs = jnp.asarray(rng.normal(size=(10, 5, 3)).astype(np.float32))
    params = gvp.init(jax.random.key(0), (feats, vecs))
    s_out, v_out = gvp.apply(params, (feats, vecs))
    assert s_out.shape == (10, 6)
    assert v_out.shape == (10, 4, 3)

    rot = jnp.asarray(random_rotation(rng))
    s_rot, v_rot = gvp.apply(params, (feats, vecs @ rot.T))
    np.testing.assert_allclose(np.asarray(s_rot), np.asarray(s_out),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_rot), np.asarray(v_out @ rot.T),
                               atol=1e-4)


def test_gvp_broadcasts_over_leading_dims(rng):
    gvp = GVP(dim_vectors_in=3, dim_vectors_out=3, dim_feats_in=4,
              dim_feats_out=4)
    feats = jnp.asarray(rng.normal(size=(2, 5, 6, 4)).astype(np.float32))
    vecs = jnp.asarray(rng.normal(size=(2, 5, 6, 3, 3)).astype(np.float32))
    params = gvp.init(jax.random.key(0), (feats, vecs))
    s, v = gvp.apply(params, (feats, vecs))
    assert s.shape == (2, 5, 6, 4)
    assert v.shape == (2, 5, 6, 3, 3)
    # per-slice application agrees with batched application
    s0, v0 = gvp.apply(params, (feats[0, 0], vecs[0, 0]))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s[0, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v[0, 0]), atol=1e-5)


def test_gvp_layernorm(rng):
    ln = GVPLayerNorm(8)
    feats = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    vecs = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32))
    params = ln.init(jax.random.key(0), feats, vecs)
    s, v = ln.apply(params, feats, vecs)
    # scalar layernorm: zero mean, unit variance per row at init
    np.testing.assert_allclose(np.asarray(s.mean(-1)), 0.0, atol=1e-5)
    # vector norm: RMS over channels ~ 1 after normalization
    vn = np.sqrt((np.asarray(v) ** 2).sum(-1).mean(-1))
    np.testing.assert_allclose(vn, 1.0, atol=0.05)
    # equivariance of the vector branch
    rot = jnp.asarray(random_rotation(rng))
    s2, v2 = ln.apply(params, feats, vecs @ rot.T)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v @ rot.T), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-6)


def test_gvp_dropout_train_and_eval(rng):
    feats = jnp.ones((100, 16))
    vecs = jnp.ones((100, 8, 3))
    f, v = gvp_dropout(jax.random.key(0), 0.5, feats, vecs,
                       deterministic=True)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(feats))
    f, v = gvp_dropout(jax.random.key(0), 0.5, feats, vecs,
                       deterministic=False)
    f, v = np.asarray(f), np.asarray(v)
    # inverted scaling: surviving entries are 2.0
    assert set(np.unique(f)) <= {0.0, 2.0}
    # whole vector channels dropped together
    chan = v.sum(-1)
    assert set(np.unique(chan)) <= {0.0, 6.0}
    assert 0.3 < (f == 0).mean() < 0.7
