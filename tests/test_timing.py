"""utils.timing.fence — the honest sync primitive every benchmark uses.

bench.py's round-3 rewrite replaced block_until_ready (which can return
before execution on the tunneled deployment, inflating MFU past 1.0) with
a device-computed-scalar fetch; these tests pin its contract on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pharmaforge_tpu.utils.timing import fence


def test_fence_returns_digest_of_first_elements():
    a = jnp.arange(6.0).reshape(2, 3)          # ravel()[0] == 0.0
    b = jnp.full((4,), 2.5)                     # ravel()[0] == 2.5
    assert fence([a, b]) == 2.5


def test_fence_handles_pytrees_mixed_dtypes_and_empty():
    tree = {"x": jnp.ones((3,), jnp.int32), "y": (jnp.zeros((2, 2)),)}
    assert fence(tree) == 1.0
    assert fence([]) == 0.0
    assert fence({"note": "no arrays here"}) == 0.0


def test_fence_forces_queued_computation():
    # the fenced value must reflect the completed computation, not a stale
    # buffer: chain a few async dispatches and check the digest is exact
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.full((8,), 1.0)
    for _ in range(5):
        x = f(x)
    assert fence(x) == 32.0
    np.testing.assert_allclose(np.asarray(x), 32.0)
