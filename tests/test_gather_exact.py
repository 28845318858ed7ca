import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.models.conv import _gather_neighbors


@pytest.mark.parametrize("dtype_mode", ["float32"])
def test_matmul_gather_bitexact_fp32(rng, dtype_mode):
    """fp32 one-hot-matmul gather must be BIT-exact vs take_along_axis
    (Precision.HIGHEST selection reconstructs 1.0 * value exactly)."""
    b, p, s, v, nd, k = 2, 37, 19, 4, 11, 6
    h = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32) * 1e3)
    vv = jnp.asarray(rng.normal(size=(b, p, v, 3)).astype(np.float32) * 1e-3)
    idx = jnp.asarray(rng.integers(0, p, size=(b, nd, k)).astype(np.int32))

    h_g, v_g = _gather_neighbors(h, vv, idx, dtype_mode)
    h_ref = jnp.take_along_axis(h[:, None], idx[..., None], axis=2)
    v_ref = jnp.take_along_axis(vv[:, None], idx[..., None, None], axis=2)
    np.testing.assert_array_equal(np.asarray(h_g), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(v_g), np.asarray(v_ref))


def test_matmul_gather_bf16_close(rng):
    b, p, s, v, nd, k = 2, 37, 19, 4, 11, 6
    h = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    vv = jnp.asarray(rng.normal(size=(b, p, v, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, p, size=(b, nd, k)).astype(np.int32))
    h_g, _ = _gather_neighbors(h, vv, idx, "bfloat16")
    h_ref = jnp.take_along_axis(h[:, None], idx[..., None], axis=2)
    # bf16 table rounding only
    np.testing.assert_allclose(np.asarray(h_g), np.asarray(h_ref),
                               rtol=8e-3, atol=8e-3)
