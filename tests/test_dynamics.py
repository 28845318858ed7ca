import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.models.dynamics import PharmRecDynamics
from pharmaforge_tpu.ops.neighbors import build_pp_neighbors
from tests.conftest import make_complex_batch
from tests.test_gvp import random_rotation


def make_model(**kw):
    defaults = dict(n_pharm_scalars=6, n_prot_scalars=11, vector_size=8,
                    n_convs=2, n_hidden_scalars=32, message_norm="mean",
                    n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                    pf_k=0, ff_k=0)
    defaults.update(kw)
    return PharmRecDynamics(**defaults)


def apply_model(model, batch, params=None, key=0):
    pp = build_pp_neighbors(jnp.asarray(batch.prot_x),
                            jnp.asarray(batch.prot_mask), 3.5, 16)
    t = jnp.full((batch.batch_size,), 0.3)
    args = (jnp.asarray(batch.pharm_h), jnp.asarray(batch.pharm_x),
            jnp.asarray(batch.pharm_mask), jnp.asarray(batch.prot_h),
            jnp.asarray(batch.prot_x), jnp.asarray(batch.prot_mask), t, pp)
    if params is None:
        params = model.init({"params": jax.random.key(key)}, *args)["params"]
    eps_h, eps_x = model.apply({"params": params}, *args)
    return params, np.asarray(eps_h), np.asarray(eps_x)


@pytest.mark.parametrize("mode", ["radius", "knn", "dyn_norm"])
def test_dynamics_shapes_finite(rng, mode):
    batch = make_complex_batch(rng, p=32, p_valid=(28, 20))
    kw = {}
    if mode == "knn":
        kw = dict(pf_k=5, ff_k=3)
    if mode == "dyn_norm":
        kw = dict(message_norm=0)
    model = make_model(**kw)
    _, eps_h, eps_x = apply_model(model, batch)
    assert eps_h.shape == batch.pharm_h.shape
    assert eps_x.shape == batch.pharm_x.shape
    assert np.isfinite(eps_h).all() and np.isfinite(eps_x).all()
    # padded slots must be exactly zero
    assert (eps_h[~batch.pharm_mask] == 0).all()
    assert (eps_x[~batch.pharm_mask] == 0).all()


def test_dynamics_se3_equivariance(rng):
    """Rotating+translating all coordinates rotates eps_x and leaves eps_h."""
    batch = make_complex_batch(rng, p=32, p_valid=(28, 20))
    model = make_model(pf_k=5)
    params, eps_h, eps_x = apply_model(model, batch)

    rot = random_rotation(rng)
    shift = rng.normal(scale=5, size=(1, 1, 3)).astype(np.float32)
    batch_r = batch.replace(
        pharm_x=(batch.pharm_x @ rot.T + shift) * batch.pharm_mask[..., None],
        prot_x=(batch.prot_x @ rot.T + shift) * batch.prot_mask[..., None])
    _, eps_h_r, eps_x_r = apply_model(model, batch_r, params=params)

    np.testing.assert_allclose(eps_h_r, eps_h, atol=2e-4)
    np.testing.assert_allclose(eps_x_r, eps_x @ rot.T, atol=2e-4)


def test_compute_dtype_bf16_close_to_fp32(rng):
    """bf16 message chains are a perf mode: outputs must track fp32 within
    bf16 tolerance and stay finite/masked."""
    batch = make_complex_batch(rng, p=32, p_valid=(28, 20))
    model32 = make_model(pf_k=5)
    params, eps_h32, eps_x32 = apply_model(model32, batch)
    model16 = make_model(pf_k=5, compute_dtype="bfloat16")
    _, eps_h16, eps_x16 = apply_model(model16, batch, params=params)
    assert np.isfinite(eps_h16).all() and np.isfinite(eps_x16).all()
    assert (eps_h16[~batch.pharm_mask] == 0).all()
    scale = np.abs(eps_h32).max() + 1e-6
    assert np.abs(eps_h16 - eps_h32).max() / scale < 0.15
    scale = np.abs(eps_x32).max() + 1e-6
    assert np.abs(eps_x16 - eps_x32).max() / scale < 0.15


def test_dynamics_padding_invariance(rng):
    """Adding more padded slots must not change the outputs."""
    batch = make_complex_batch(rng, f=6, p=24, f_valid=(5, 3),
                               p_valid=(20, 16))
    model = make_model()
    params, eps_h, eps_x = apply_model(model, batch)

    def grow(arr, axis, n):
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, n)
        return np.pad(arr, widths)

    batch_big = batch.replace(
        pharm_x=grow(batch.pharm_x, 1, 2), pharm_h=grow(batch.pharm_h, 1, 2),
        pharm_mask=grow(batch.pharm_mask, 1, 2),
        prot_x=grow(batch.prot_x, 1, 8), prot_h=grow(batch.prot_h, 1, 8),
        prot_mask=grow(batch.prot_mask, 1, 8))
    _, eps_h_b, eps_x_b = apply_model(model, batch_big, params=params)

    np.testing.assert_allclose(eps_h_b[:, :6], eps_h, atol=1e-5)
    np.testing.assert_allclose(eps_x_b[:, :6], eps_x, atol=1e-5)
