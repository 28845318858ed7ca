"""Compact prot-tail: the final prot update runs only on the F*K atoms the
next conv's pf lists gather (the only consumers of that state under
`prune_dead_prot_tail`), with fp aggregation on the slot-equality matrix and
the subsequent pf gather reduced to a reshape. These tests pin exactness
against the full-width path across norm modes, conv depths, and batch
layouts, and through the full sampling chain.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.data.batch import tile_pocket
from pharmaforge_tpu.models.diffusion import (
    DiffusionConfig,
    PharmacophoreDiffusion,
)
from tests.conftest import make_complex_batch


def cfg_pair(**kw):
    base = dict(n_timesteps=6, n_convs=2, vector_size=8,
                n_hidden_scalars=32, message_norm="mean",
                n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                pf_k=4, pp_k_max=8)
    base.update(kw)
    return (DiffusionConfig(**base, compact_prot_tail=True),
            DiffusionConfig(**base, compact_prot_tail=False))


@pytest.mark.parametrize("message_norm,n_convs", [
    ("mean", 2), (0, 2), (10, 2), ("mean", 3),
])
def test_denoiser_forward_matches_full(rng, message_norm, n_convs):
    """Single deterministic denoiser forward: compact == full-width."""
    batch = make_complex_batch(rng, b=3, p=40, f_valid=(5, 3, 8),
                               p_valid=(36, 28, 40))
    c_on, c_off = cfg_pair(message_norm=message_norm, n_convs=n_convs)
    m_on, m_off = PharmacophoreDiffusion(c_on), PharmacophoreDiffusion(c_off)
    params = m_on.init_params(jax.random.key(0), batch)

    from pharmaforge_tpu.ops.neighbors import build_pp_neighbors
    pp = build_pp_neighbors(jnp.asarray(batch.prot_x),
                            jnp.asarray(batch.prot_mask), 3.5, 8)
    t = jnp.asarray([0.3, 0.7, 0.1])
    args = (jnp.asarray(batch.pharm_h), jnp.asarray(batch.pharm_x),
            jnp.asarray(batch.pharm_mask), jnp.asarray(batch.prot_h),
            jnp.asarray(batch.prot_x), jnp.asarray(batch.prot_mask), t, pp)
    h_on, x_on = m_on.dynamics.apply({"params": params}, *args,
                                     deterministic=True)
    h_off, x_off = m_off.dynamics.apply({"params": params}, *args,
                                        deterministic=True)
    np.testing.assert_allclose(np.asarray(h_on), np.asarray(h_off),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_on), np.asarray(x_off),
                               rtol=1e-5, atol=1e-6)


def test_full_chain_matches_and_composes_with_dedup(rng):
    """Sampling chain: compact tail + pocket-group dedup together == the
    plain full-width ungrouped chain."""
    prot_x = rng.normal(scale=6.0, size=(40, 3)).astype(np.float32)
    prot_h = np.eye(11, dtype=np.float32)[rng.integers(0, 11, 40)]
    batch = tile_pocket(prot_x, prot_h, rng.integers(3, 9, 6))
    c_on, c_off = cfg_pair()
    m_on, m_off = PharmacophoreDiffusion(c_on), PharmacophoreDiffusion(c_off)
    params = m_on.init_params(jax.random.key(0), batch)
    key = jax.random.key(5)
    out_on = m_on.sample_given_receptor(params, batch, key,
                                        pocket_group_size=batch.batch_size)
    out_off = m_off.sample_given_receptor(params, batch, key,
                                          pocket_group_size=1)
    np.testing.assert_allclose(np.asarray(out_on["pharm_x"]),
                               np.asarray(out_off["pharm_x"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_on["pharm_h"]),
                               np.asarray(out_off["pharm_h"]),
                               rtol=1e-4, atol=1e-4)


def test_training_loss_unaffected_by_flag(rng):
    """The compact path is deterministic-only: training losses (train=True,
    dropout active) are bitwise identical whichever way the flag is set."""
    batch = make_complex_batch(rng, b=2, p=32, p_valid=(28, 24))
    c_on, c_off = cfg_pair(dropout=0.1)
    m_on, m_off = PharmacophoreDiffusion(c_on), PharmacophoreDiffusion(c_off)
    params = m_on.init_params(jax.random.key(0), batch)
    t_on, _ = m_on.loss(params, batch, jax.random.key(3), train=True)
    t_off, _ = m_off.loss(params, batch, jax.random.key(3), train=True)
    assert float(t_on) == float(t_off)
