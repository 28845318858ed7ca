"""Scanned multi-step training call vs K sequential single steps.

`make_multi_train_step` exists purely to amortize per-call dispatch
(train_state.py docstring); it must be a pure refactor of the update math.
Given the same per-step keys, K scanned steps must reproduce K sequential
`make_train_step` calls bit-for-bit (same platform, fp32 matmuls from
conftest).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pharmaforge_tpu.data.batch import stack_batches
from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
from pharmaforge_tpu.training.optim import make_optimizer
from pharmaforge_tpu.training.train_state import (
    TrainState,
    make_multi_train_step,
    make_train_step,
)
from tests.conftest import make_complex_batch
from tests.test_diffusion import tiny_config


def _init_state(model, batch, optimizer):
    params = model.init_params(jax.random.key(0), batch)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=np.int32(0))


def test_multi_step_matches_sequential(rng):
    k = 3
    batches = [make_complex_batch(np.random.default_rng(100 + i),
                                  b=2, p=24, p_valid=(20, 16))
               for i in range(k)]
    model = PharmacophoreDiffusion(tiny_config())
    optimizer = make_optimizer(2e-3, weight_decay=1e-12)
    state_a = _init_state(model, batches[0], optimizer)
    state_b = state_a

    call_key = jax.random.key(42)
    lr = 2e-3

    # reference: K sequential single steps with the same split keys
    single = make_train_step(model, optimizer, donate=False)
    seq_aux = []
    for i, (b, kk) in enumerate(zip(batches,
                                    jax.random.split(call_key, k))):
        state_a, aux = single(state_a, b, kk, lr)
        seq_aux.append(aux)

    multi = make_multi_train_step(model, optimizer, donate=False)
    state_b, stacked_aux = multi(state_b, stack_batches(batches),
                                 call_key, lr)

    assert int(state_b.step) == int(state_a.step) == k
    for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for key in seq_aux[0]:
        got = np.asarray(stacked_aux[key])
        assert got.shape[0] == k
        want = np.array([float(a[key]) for a in seq_aux])
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_multi_step_aux_shapes(rng):
    """Every aux metric comes back with a leading K axis."""
    k = 2
    batches = [make_complex_batch(np.random.default_rng(7 + i),
                                  b=2, p=24, p_valid=(20, 16))
               for i in range(k)]
    model = PharmacophoreDiffusion(tiny_config())
    optimizer = make_optimizer(1e-3, weight_decay=1e-12)
    state = _init_state(model, batches[0], optimizer)
    multi = make_multi_train_step(model, optimizer, donate=False)
    state, aux = multi(state, stack_batches(batches), jax.random.key(0),
                       1e-3)
    for v in aux.values():
        assert jnp.shape(v)[0] == k
