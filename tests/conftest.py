"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test process so the
platform and host-device-count flags take effect.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# NOTE: multi-device mesh behavior is tested through a subprocess
# (tests/test_multichip.py) rather than by forcing 8 virtual CPU devices
# here: on this 1-core host the 8-device XLA CPU runtime intermittently
# deadlocks inside execution (main thread stuck in Array._value, worker
# threads futex-waiting), poisoning the whole suite.

import jax

# force the CPU platform through jax.config: the env var alone is not enough
# on hosts whose site customization registers a TPU plugin and re-selects it
# (tests must not contend with TPU jobs for the single tunneled chip)
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: this box has a single CPU core, recompiling
# identical test programs on every run would dominate wall-clock
jax.config.update("jax_compilation_cache_dir", "/tmp/pharmaforge_jax_cache")
# this XLA build lowers default-precision f32 matmuls to bf16; tests verify
# exact numerics (equivariance, parity), so force full f32 matmuls
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_complex_batch(rng, b=2, f=8, p=48, f_valid=(5, 3), p_valid=(40, 33),
                       n_ph=6, n_el=11):
    """Small random dense complex batch with realistic coordinate scales."""
    from pharmaforge_tpu.data.batch import PharmComplexBatch

    pharm_x = rng.normal(scale=3.0, size=(b, f, 3)).astype(np.float32)
    pharm_t = rng.integers(0, n_ph, size=(b, f))
    pharm_h = np.eye(n_ph, dtype=np.float32)[pharm_t]
    prot_x = rng.normal(scale=6.0, size=(b, p, 3)).astype(np.float32)
    prot_t = rng.integers(0, n_el, size=(b, p))
    prot_h = np.eye(n_el, dtype=np.float32)[prot_t]

    pharm_mask = np.zeros((b, f), bool)
    prot_mask = np.zeros((b, p), bool)
    for i in range(b):
        pharm_mask[i, :f_valid[i % len(f_valid)]] = True
        prot_mask[i, :p_valid[i % len(p_valid)]] = True

    pharm_x *= pharm_mask[..., None]
    pharm_h *= pharm_mask[..., None]
    prot_x *= prot_mask[..., None]
    prot_h *= prot_mask[..., None]

    return PharmComplexBatch(
        pharm_x=pharm_x, pharm_h=pharm_h, pharm_mask=pharm_mask,
        prot_x=prot_x, prot_h=prot_h, prot_mask=prot_mask)


@pytest.fixture
def small_batch(rng):
    return make_complex_batch(rng)
