"""Sampling-scan table precompute (models/dynamics.py::precompute_sampling_tables).

The reverse chain's conv0 work that depends only on (timestep, pocket) —
prot scalar encoding, the whole prot-prot message chain, the pf chain's
per-node source table — is hoisted out of the `lax.scan` into ONE batched
pass over all T steps. These tests pin the claim that the hoisted chain is
numerically equivalent to the per-step chain, across grouping modes and
conv depths (reference chain semantics: pharmacodiff.py:433-514).
"""

import numpy as np
import jax
import pytest

from pharmaforge_tpu.data.batch import tile_pocket
from pharmaforge_tpu.models.diffusion import (
    DiffusionConfig,
    PharmacophoreDiffusion,
)


def tiny_config(**kw):
    defaults = dict(n_timesteps=6, n_convs=2, vector_size=8,
                    n_hidden_scalars=32, message_norm="mean",
                    n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                    pf_k=4, pp_k_max=8)
    defaults.update(kw)
    return DiffusionConfig(**defaults)


def make_tiled_batch(rng, b=6, p=40):
    prot_x = rng.normal(scale=6.0, size=(p, 3)).astype(np.float32)
    prot_h = np.eye(11, dtype=np.float32)[rng.integers(0, 11, p)]
    sizes = rng.integers(3, 9, b)
    return tile_pocket(prot_x, prot_h, sizes)


def run_pair(batch, group, seed=0, **cfg_kw):
    """Sample the same chain with and without the table precompute."""
    key = jax.random.key(1)
    outs = []
    for tables_on in (False, True):
        model = PharmacophoreDiffusion(
            tiny_config(precompute_step_tables=tables_on, **cfg_kw))
        params = model.init_params(jax.random.key(seed), batch)
        outs.append(model.sample_given_receptor(
            params, batch, key, pocket_group_size=group))
    return outs


@pytest.mark.parametrize("message_norm", ["mean", 0, 10])
def test_tables_match_per_step_ungrouped(message_norm):
    rng = np.random.default_rng(0)
    batch = make_tiled_batch(rng)
    off, on = run_pair(batch, group=1, message_norm=message_norm)
    np.testing.assert_allclose(np.asarray(on["pharm_x"]),
                               np.asarray(off["pharm_x"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(on["pharm_h"]),
                               np.asarray(off["pharm_h"]),
                               rtol=1e-4, atol=1e-5)


def test_tables_match_per_step_grouped():
    """Grouped pockets: the tables stay at group level end to end (with
    n_convs=2 the compact conv IS conv0, so the full-width [B,P,S] prot
    scalars are never materialized)."""
    rng = np.random.default_rng(1)
    a = make_tiled_batch(rng, b=3, p=32)
    b = make_tiled_batch(rng, b=3, p=32)
    both = jax.tree_util.tree_map(
        lambda x, y: np.concatenate([x, y], axis=0), a, b)
    off, on = run_pair(both, group=3)
    np.testing.assert_allclose(np.asarray(on["pharm_x"]),
                               np.asarray(off["pharm_x"]),
                               rtol=1e-4, atol=1e-5)


def test_tables_match_deeper_stack():
    """n_convs=3: conv0 is NOT the compact conv -> the repeat/broadcast
    branch of the injection is exercised."""
    rng = np.random.default_rng(2)
    batch = make_tiled_batch(rng, b=4, p=36)
    off, on = run_pair(batch, group=2, n_convs=3)
    np.testing.assert_allclose(np.asarray(on["pharm_x"]),
                               np.asarray(off["pharm_x"]),
                               rtol=1e-4, atol=1e-5)


def test_tables_match_single_conv_no_pp():
    """n_convs=1 with a pruned prot tail: conv0 has no pp chain at all, so
    only the encoder + pf table hoist."""
    rng = np.random.default_rng(3)
    batch = make_tiled_batch(rng, b=4, p=30)
    off, on = run_pair(batch, group=1, n_convs=1)
    np.testing.assert_allclose(np.asarray(on["pharm_x"]),
                               np.asarray(off["pharm_x"]),
                               rtol=1e-4, atol=1e-5)


def test_budget_gate_disables_tables():
    """Above the HBM budget the sampler silently falls back to per-step."""
    rng = np.random.default_rng(4)
    batch = make_tiled_batch(rng, b=3, p=24)
    model = PharmacophoreDiffusion(tiny_config(precompute_table_budget=1))
    params = model.init_params(jax.random.key(0), batch)
    out = model.sample_given_receptor(params, batch, jax.random.key(1))
    assert np.isfinite(np.asarray(out["pharm_x"])).all()
