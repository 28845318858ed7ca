import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.models.gvp import torch_linear_init
from pharmaforge_tpu.ops.pallas.gvp_message import (
    fused_neighbor_messages,
    neighbor_messages_reference,
)
from pharmaforge_tpu.ops.neighbors import radius_neighbor_list


def make_weights(key, n_gvps, s_dim, v_dim, rbf_dim=16):
    ws = []
    for j in range(n_gvps):
        c_in = v_dim + 1 if j == 0 else v_dim
        s_in = s_dim + rbf_dim if j == 0 else s_dim
        dim_h = max(c_in, v_dim)
        key, *ks = jax.random.split(key, 7)
        ws.append({
            "Wh": torch_linear_init(c_in)(ks[0], (c_in, dim_h)),
            "Wu": torch_linear_init(dim_h)(ks[1], (dim_h, v_dim)),
            "to_feats_out": {
                "kernel": torch_linear_init(s_in + dim_h)(
                    ks[2], (s_in + dim_h, s_dim)),
                "bias": torch_linear_init(s_in + dim_h)(ks[3], (s_dim,)),
            },
            "scalar_to_vector_gates": {
                "kernel": torch_linear_init(s_dim)(ks[4], (s_dim, v_dim)),
                "bias": torch_linear_init(s_dim)(ks[5], (v_dim,)),
            },
        })
    return ws


def make_inputs(rng, b=2, p=64, k=8, s_dim=32, v_dim=8):
    h = rng.normal(size=(b, p, s_dim)).astype(np.float32)
    v = rng.normal(size=(b, p, v_dim, 3)).astype(np.float32)
    x = rng.normal(scale=5.0, size=(b, p, 3)).astype(np.float32)
    mask = np.ones((b, p), bool)
    mask[:, -5:] = False
    nl = radius_neighbor_list(jnp.asarray(x), jnp.asarray(mask), 6.0, k)
    return (jnp.asarray(h), jnp.asarray(v), jnp.asarray(x),
            nl.idx, nl.mask)


def test_reference_masked_sums(rng):
    h, v, x, idx, mask = make_inputs(rng)
    ws = make_weights(jax.random.key(0), 2, 32, 8)
    s_sum, v_sum, counts = neighbor_messages_reference(h, v, x, idx, mask, ws)
    assert s_sum.shape == (2, 64, 32)
    assert v_sum.shape == (2, 64, 8, 3)
    assert np.isfinite(np.asarray(s_sum)).all()
    # rows with zero neighbors aggregate to exactly zero
    c = np.asarray(counts)
    assert (np.abs(np.asarray(s_sum)[c == 0]).max() == 0.0)


def test_fused_kernel_interpret_matches_reference(rng):
    """Interpreter-mode Pallas (runs on CPU) must match the jnp twin."""
    h, v, x, idx, mask = make_inputs(rng)
    ws = make_weights(jax.random.key(0), 3, 32, 8)
    s_ref, v_ref, c_ref = neighbor_messages_reference(h, v, x, idx, mask, ws)
    s_fus, v_fus, c_fus = fused_neighbor_messages(
        h, v, x, idx, mask, ws, compute_dtype=jnp.float32, tile_p=32,
        interpret=True)
    np.testing.assert_allclose(np.asarray(c_fus), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(s_fus), np.asarray(s_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(v_fus), np.asarray(v_ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_fused_kernel_compiled_on_tpu(rng):
    """Compiled-kernel parity, run only when a TPU backend is present."""
    import subprocess, sys, os
    from pathlib import Path
    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/tmp/pharmaforge_jax_cache')\n"
        "from tests.test_pallas_message import make_weights, make_inputs\n"
        "from pharmaforge_tpu.ops.pallas.gvp_message import (\n"
        "    fused_neighbor_messages, neighbor_messages_reference,\n"
        "    pallas_supported)\n"
        "assert pallas_supported(), jax.default_backend()\n"
        "rng = np.random.default_rng(0)\n"
        "h, v, x, idx, mask = make_inputs(rng)\n"
        "ws = make_weights(jax.random.key(0), 3, 32, 8)\n"
        "s_r, v_r, _ = neighbor_messages_reference(h, v, x, idx, mask, ws)\n"
        "s_f, v_f, _ = fused_neighbor_messages(h, v, x, idx, mask, ws,\n"
        "    compute_dtype=jnp.float32, tile_p=32)\n"
        "np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r),"
        " atol=2e-3, rtol=2e-3)\n"
        "np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r),"
        " atol=2e-3, rtol=2e-3)\n"
        "print('tpu kernel parity OK')\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU register if present
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=Path(__file__).resolve().parent.parent,
                         env=env, capture_output=True, text=True,
                         timeout=1200)
    if "Backend 'axon' is not in the list" in out.stderr or \
            "No TPU" in out.stderr:
        pytest.skip("no TPU available")
    assert out.returncode == 0, out.stderr[-3000:]
    assert "tpu kernel parity OK" in out.stdout
