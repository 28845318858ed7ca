import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.models.diffusion import (
    DiffusionConfig,
    PharmacophoreDiffusion,
    alpha_of_gamma,
    sigma_and_alpha_t_given_s,
    sigma_of_gamma,
)
from tests.conftest import make_complex_batch


def tiny_config(**kw):
    defaults = dict(n_timesteps=8, n_convs=1, vector_size=8,
                    n_hidden_scalars=32, message_norm="mean",
                    n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                    pf_k=4, pp_k_max=16)
    defaults.update(kw)
    return DiffusionConfig(**defaults)


def test_posterior_identities():
    """alpha_t = alpha_{t|s} * alpha_s and sigma2_{t|s} = sigma_t^2 -
    alpha_{t|s}^2 sigma_s^2 (the DDPM transition algebra)."""
    gamma_s = jnp.asarray(-2.0)
    gamma_t = jnp.asarray(1.5)
    s2, s_tgs, a_tgs, a_s = sigma_and_alpha_t_given_s(gamma_t, gamma_s)
    a_t = alpha_of_gamma(gamma_t)
    sig_t = sigma_of_gamma(gamma_t)
    sig_s = sigma_of_gamma(gamma_s)
    np.testing.assert_allclose(float(a_tgs * a_s), float(a_t), rtol=1e-5)
    np.testing.assert_allclose(float(s2),
                               float(sig_t ** 2 - a_tgs ** 2 * sig_s ** 2),
                               rtol=1e-4)
    np.testing.assert_allclose(float(s_tgs ** 2), float(s2), rtol=1e-5)


@pytest.mark.parametrize("endpoint", [False, True])
def test_loss_runs_and_masks(rng, endpoint):
    batch = make_complex_batch(rng, p=32, p_valid=(28, 20))
    cfg = tiny_config(endpoint_param_feat=endpoint,
                      endpoint_param_coord=endpoint,
                      weighted_loss=endpoint)
    model = PharmacophoreDiffusion(cfg)
    params = model.init_params(jax.random.key(0), batch)
    total, aux = model.loss(params, batch, jax.random.key(1), train=False)
    assert np.isfinite(float(total))
    for k, v in aux.items():
        assert np.isfinite(float(v)), k
    assert "train pos loss" in aux and "train accuracy" in aux


def test_loss_grads_finite(rng):
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    # n_convs=2 so prot-side update params feed the pharm outputs (with a
    # single conv they are dead weights and legitimately get zero grads)
    model = PharmacophoreDiffusion(tiny_config(n_convs=2))
    params = model.init_params(jax.random.key(0), batch)

    def loss_fn(p):
        return model.loss(p, batch, jax.random.key(1), train=False)[0]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradient must reach the deepest message weights
    norms = [float(jnp.linalg.norm(g)) for g in leaves]
    assert sum(n > 0 for n in norms) > len(norms) * 0.8


def test_sampling_shapes_and_frame(rng):
    batch = make_complex_batch(rng, b=3, p=24, f_valid=(4, 6, 3),
                               p_valid=(20,))
    model = PharmacophoreDiffusion(tiny_config())
    params = model.init_params(jax.random.key(0), batch)
    out = model.sample_given_receptor(params, batch, jax.random.key(2),
                                      visualize_trajectory=True)
    x = np.asarray(out["pharm_x"])
    h = np.asarray(out["pharm_h"])
    assert x.shape == batch.pharm_x.shape
    assert np.isfinite(x).all() and np.isfinite(h).all()
    assert np.asarray(out["traj_x"]).shape == (9,) + batch.pharm_x.shape
    # padded slots remain zero
    assert (x[~batch.pharm_mask] == 0).all()
    # generated pharmacophores land near the requested init COM: with an
    # untrained model the chain stays within a few units of the pocket COM
    prot_com = (batch.prot_x * batch.prot_mask[..., None]).sum(1) / \
        batch.prot_mask.sum(1, keepdims=True)
    com = x.sum(1) / batch.pharm_mask.sum(1, keepdims=True)
    assert np.linalg.norm(com - prot_com, axis=-1).max() < 30.0


def test_sampling_respects_init_com(rng):
    batch = make_complex_batch(rng, b=2, p=24, p_valid=(20,))
    model = PharmacophoreDiffusion(tiny_config())
    params = model.init_params(jax.random.key(0), batch)
    target = np.array([[5.0, -3.0, 2.0], [0.0, 0.0, 10.0]], np.float32)
    out = model.sample_given_receptor(params, batch, jax.random.key(2),
                                      init_pharm_com=jnp.asarray(target))
    x = np.asarray(out["pharm_x"])
    com = x.sum(1) / batch.pharm_mask.sum(1, keepdims=True)
    # the final protein-COM restoration puts samples in the original pocket
    # frame; they should sit around the requested COM, not the pocket COM
    assert np.isfinite(com).all()


def test_sampling_noise_injection_reproducible(rng):
    """Injecting every random draw makes the chain a deterministic function
    of (params, noise) — the trajectory-matching harness contract."""
    batch = make_complex_batch(rng, b=2, p=24, p_valid=(20,))
    cfg = tiny_config()
    model = PharmacophoreDiffusion(cfg)
    params = model.init_params(jax.random.key(0), batch)
    b, f = batch.pharm_mask.shape
    t = cfg.n_timesteps
    noise = {
        "x_T": rng.normal(size=(b, f, 3)).astype(np.float32),
        "h_T": rng.normal(size=(b, f, 6)).astype(np.float32),
        "pos": rng.normal(size=(t, b, f, 3)).astype(np.float32),
        "feat": rng.normal(size=(t, b, f, 6)).astype(np.float32),
    }
    out1 = model.sample_given_receptor(params, batch, jax.random.key(1),
                                       noise=noise, visualize_trajectory=True)
    out2 = model.sample_given_receptor(params, batch, jax.random.key(999),
                                       noise=noise)
    np.testing.assert_allclose(np.asarray(out1["pharm_x"]),
                               np.asarray(out2["pharm_x"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1["pharm_h"]),
                               np.asarray(out2["pharm_h"]), atol=1e-6)
    # different injected noise changes the outcome
    noise2 = dict(noise, x_T=noise["x_T"] + 1.0)
    out3 = model.sample_given_receptor(params, batch, jax.random.key(1),
                                       noise=noise2)
    assert np.abs(np.asarray(out3["pharm_x"])
                  - np.asarray(out1["pharm_x"])).max() > 1e-4


def test_sampling_chain_se3_equivariance(rng):
    """The FULL reverse chain is SE(3)-equivariant: rotating+translating the
    pocket (and rotating the injected noise) rotates+translates the sampled
    pharmacophores. Holds end-to-end through COM removals, posterior updates
    and the final frame restoration."""
    from tests.test_gvp import random_rotation

    batch = make_complex_batch(rng, b=2, p=24, p_valid=(20,))
    cfg = tiny_config()
    model = PharmacophoreDiffusion(cfg)
    params = model.init_params(jax.random.key(0), batch)
    b, f = batch.pharm_mask.shape
    t = cfg.n_timesteps
    noise = {
        "x_T": rng.normal(size=(b, f, 3)).astype(np.float32),
        "h_T": rng.normal(size=(b, f, 6)).astype(np.float32),
        "pos": rng.normal(size=(t, b, f, 3)).astype(np.float32),
        "feat": rng.normal(size=(t, b, f, 6)).astype(np.float32),
    }
    out = model.sample_given_receptor(params, batch, jax.random.key(1),
                                      noise=noise)

    rot = random_rotation(rng)
    shift = rng.normal(scale=8, size=(1, 1, 3)).astype(np.float32)
    batch_r = batch.replace(
        prot_x=(batch.prot_x @ rot.T + shift) * batch.prot_mask[..., None])
    noise_r = dict(noise, x_T=noise["x_T"] @ rot.T,
                   pos=noise["pos"] @ rot.T)
    out_r = model.sample_given_receptor(params, batch_r, jax.random.key(1),
                                        noise=noise_r)

    m = batch.pharm_mask
    want_x = (np.asarray(out["pharm_x"]) @ rot.T + shift) * m[..., None]
    np.testing.assert_allclose(np.asarray(out_r["pharm_x"]) * m[..., None],
                               want_x, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_r["pharm_h"]),
                               np.asarray(out["pharm_h"]), atol=5e-3)


def test_config_from_yaml_dict():
    config = {
        "dataset": {"ph_type_map": list("abcdef"),
                    "prot_elements": list("CNOSPFLBID!")},
        "diffusion": {"n_timesteps": 100, "precision": 1e-5,
                      "pharm_feat_norm_constant": 1,
                      "endpoint_param_feat": False,
                      "endpoint_param_coord": False,
                      "weighted_loss": False, "remove_com": True,
                      "rl_dist_threshold": 0},
        "dynamics": {"vector_size": 16, "n_convs": 2,
                     "n_hidden_scalars": 128, "message_norm": "mean",
                     "dropout": 0.1, "ff_k": 0, "pf_k": 5,
                     "n_message_gvps": 3, "n_update_gvps": 2,
                     "n_noise_gvps": 4},
        "graph": {"graph_cutoffs": {"pp": 3.5, "pf": 8, "fp": 8, "ff": 9}},
    }
    cfg = DiffusionConfig.from_config(config)
    assert cfg.n_timesteps == 100
    assert cfg.pf_k == 5
    assert cfg.n_noise_gvps == 4
    assert dict(cfg.graph_cutoffs)["pp"] == 3.5
    assert cfg.pharm_nf == 6 and cfg.rec_nf == 11


def test_model_construction_is_device_free():
    """Building the model must not touch the jax backend: the bench/driver
    outage-retry wrappers (bench.py::_retry_device,
    __graft_entry__::_retry_backend) construct the model once outside the
    retried region and rebuild only device state per attempt after a
    backend reset. A device-resident buffer created in __init__ would (a)
    move the first device touch outside the retry and (b) keep the dead
    backend alive across resets — the round-2 unrecorded-bench failure."""
    before = len(jax.live_arrays())
    model = PharmacophoreDiffusion(tiny_config())
    assert isinstance(model.gamma_table, np.ndarray)
    assert len(jax.live_arrays()) == before
