import numpy as np
import jax.numpy as jnp

from pharmaforge_tpu.ops.geometry import (
    masked_com,
    masked_mean,
    norm_no_nan,
    rbf,
    remove_masked_com,
)


def test_norm_no_nan_matches_reference_semantics():
    x = np.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]], np.float32)
    n = np.asarray(norm_no_nan(jnp.asarray(x)))
    assert abs(n[0] - 5.0) < 1e-6
    # zero vector clamps to sqrt(eps) = 1e-4
    assert abs(n[1] - 1e-4) < 1e-9


def test_rbf_values():
    d = jnp.asarray([0.0, 7.5, 15.0])
    out = np.asarray(rbf(d, d_max=15.0, d_count=16))
    assert out.shape == (3, 16)
    mu = np.linspace(0, 15, 16)
    sigma = 15.0 / 16
    expected = np.exp(-(((7.5 - mu) / sigma) ** 2))
    np.testing.assert_allclose(out[1], expected, rtol=1e-5)


def test_masked_mean_ignores_padding(rng):
    x = rng.normal(size=(2, 5, 3)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], bool)
    got = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask)[..., None], axis=1))
    np.testing.assert_allclose(got[0], x[0, :3].mean(0), rtol=1e-5)
    np.testing.assert_allclose(got[1], x[1, 0], rtol=1e-5)


def test_masked_mean_empty_returns_zero():
    x = jnp.ones((1, 4, 3))
    mask = jnp.zeros((1, 4, 1), bool)
    np.testing.assert_allclose(np.asarray(masked_mean(x, mask, axis=1)), 0.0)


def test_remove_masked_com_idempotent(rng):
    pharm_x = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    prot_x = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0]], bool))
    px, rx, com = remove_masked_com(pharm_x, mask, prot_x)
    com2 = np.asarray(masked_com(px, mask))
    np.testing.assert_allclose(com2, 0.0, atol=1e-5)
    # second removal is a no-op
    px2, rx2, _ = remove_masked_com(px, mask, rx)
    np.testing.assert_allclose(np.asarray(px2), np.asarray(px), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rx2), np.asarray(rx), atol=1e-5)
