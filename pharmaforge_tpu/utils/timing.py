"""Honest timing fences for async-dispatch benchmarks.

On this deployment the TPU sits behind a network tunnel ("axon" plugin) and
`jax.block_until_ready` can return BEFORE the device has actually executed
the queued work: a round-3 probe saw a T=100 DDPM chain "block" in 1.3 ms
while a device-computed scalar over the same outputs took ~79 ms/call to
arrive, and the naive timing pushed the derived MFU past 1.0 — beyond the
hardware's bf16 peak, i.e. physically impossible. `block_until_ready`
apparently completes once the tunnel acknowledges enqueue, not once the
executable finishes.

The only sync primitive that cannot lie is data arriving on the host: a
device-computed scalar that depends on the outputs can only be produced
after every producing executable has run, and fetching 4 bytes costs one
tunnel round trip (tens of ms — amortize it over a deep enough dispatch
queue). `fence()` below builds exactly that: jit a sum of one element from
every output leaf, fetch it with `float()`, and return only then.

Used by bench.py, scripts/bench_train.py, scripts/ab_knob.py,
scripts/perf_ablation.py, scripts/bench_sweep.py.
"""

from __future__ import annotations

import functools


@functools.cache
def _fence_fn():
    import jax
    import jax.numpy as jnp

    # one element per leaf: depending on ANY element of an executable's
    # output buffer forces the whole executable (outputs materialize only
    # when it completes), and avoids a full reduction over big arrays
    def digest(leaves):
        acc = jnp.float32(0.0)
        for x in leaves:
            acc = acc + jnp.ravel(x)[0].astype(jnp.float32)
        return acc

    return jax.jit(digest)


def fence(tree) -> float:
    """Return only after every computation `tree`'s arrays depend on has
    REALLY executed on the device: computes a device-side scalar over the
    leaves and fetches it to the host. The returned float is the digest
    (useful only to keep the value alive / assert finiteness)."""
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    return float(_fence_fn()(leaves))
