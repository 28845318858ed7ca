import numpy as np
import jax
import pytest

from pharmaforge_tpu.interop.torch_import import (
    config_from_hyper_parameters,
    export_torch_state_dict,
    import_torch_state_dict,
    load_torch_checkpoint,
    model_from_torch_checkpoint,
)
from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
from tests.conftest import make_complex_batch
from tests.test_diffusion import tiny_config


def test_torch_state_dict_roundtrip(rng):
    """params -> torch-layout state dict -> params is the identity."""
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))

    state = export_torch_state_dict(params, cfg)
    # keys look like the reference module tree
    assert "dynamics.pharm_encoder.0.weight" in state
    assert ("dynamics.noise_predictor.conv_layers.0."
            "edge_message_fns.pharm_ff_pharm.0.Wh") in state
    assert "dynamics.noise_predictor.noise_predictor.to_scalar_output.weight" in state
    # torch Linear orientation: [out, in]
    w = state["dynamics.pharm_encoder.0.weight"]
    assert w.shape[0] == 32  # n_hidden_scalars rows

    back = import_torch_state_dict(state, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_imported_params_drive_the_model(rng):
    """An imported tree must be accepted by the denoiser apply."""
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))
    state = export_torch_state_dict(params, cfg)
    # scale every weight: the imported model must produce different outputs
    state = {k: v * 1.5 for k, v in state.items()}
    imported = import_torch_state_dict(state, cfg)

    t1, _ = model.loss(params, batch, jax.random.key(0), train=False)
    t2, _ = model.loss(imported, batch, jax.random.key(0), train=False)
    assert np.isfinite(float(t2))
    assert float(t1) != float(t2)


def test_import_missing_key_raises(rng):
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))
    state = export_torch_state_dict(params, cfg)
    state.pop("dynamics.pharm_encoder.0.weight")
    with pytest.raises(KeyError):
        import_torch_state_dict(state, cfg)


# --- real PL .ckpt FILE path ------------------------------------------------
# The reference saves checkpoints as torch.save({'state_dict': ...,
# 'hyper_parameters': <ctor kwargs via save_hyperparameters()>, ...})
# (pharmacodiff.py:78; PL ModelCheckpoint). The repo ships no trained
# checkpoint, so these tests synthesize one in the exact PL layout and drive
# load_torch_checkpoint / model_from_torch_checkpoint through the FILE —
# covering torch.load, PL nesting, gamma-table validation, and
# hyper_parameters -> DiffusionConfig.


def _write_pl_checkpoint(tmp_path, cfg, params, *, corrupt_gamma=False,
                         drop_hparams=False):
    import torch

    from pharmaforge_tpu.models.schedules import make_gamma_table

    state = {k: torch.from_numpy(np.array(v, copy=True))
             for k, v in export_torch_state_dict(params, cfg).items()}
    gamma = make_gamma_table(cfg.noise_schedule, cfg.n_timesteps,
                             precision=cfg.precision)
    if corrupt_gamma:
        gamma = gamma + 0.1
    state["gamma.gamma"] = torch.from_numpy(np.asarray(gamma))
    # hyper_parameters exactly as the reference factory passes them
    # (config_utils/load_from_config.py:16-30): nested graph/dynamics dicts,
    # flattened diffusion section, plus keys our config ignores
    ckpt = {
        "epoch": 7,
        "global_step": 1234,
        "pytorch-lightning_version": "2.1.0",
        "state_dict": state,
        "optimizer_states": [{}],
        "lr_schedulers": [{}],
        "hyper_parameters": {
            "pharm_nf": cfg.pharm_nf,
            "rec_nf": cfg.rec_nf,
            "ph_type_map": ["Aromatic", "HydrogenDonor", "HydrogenAcceptor",
                            "PositiveIon", "NegativeIon", "Hydrophobic"],
            "processed_data_dir": "data/crossdocked_processed_dev",
            "n_timesteps": cfg.n_timesteps,
            "graph_config": {"graph_cutoffs":
                             {"pp": 3.5, "pf": 8, "fp": 8, "ff": 9}},
            "dynamics_config": {
                "vector_size": cfg.vector_size,
                "n_convs": cfg.n_convs,
                "n_hidden_scalars": cfg.n_hidden_scalars,
                "message_norm": cfg.message_norm,
                "dropout": cfg.dropout,
                "ff_k": cfg.ff_k,
                "pf_k": cfg.pf_k,
                "n_message_gvps": cfg.n_message_gvps,
                "n_update_gvps": cfg.n_update_gvps,
                "n_noise_gvps": cfg.n_noise_gvps,
            },
            "lr_scheduler_config": {"base_lr": 1e-4},
            "precision": cfg.precision,
            "pharm_feat_norm_constant": cfg.pharm_feat_norm_constant,
            "rl_dist_threshold": 0,  # vestigial, swallowed by **kwargs
            "endpoint_param_feat": cfg.endpoint_param_feat,
            "endpoint_param_coord": cfg.endpoint_param_coord,
            "weighted_loss": cfg.weighted_loss,
            "remove_com": cfg.remove_com,
            "batch_size": 64,
        },
    }
    if drop_hparams:
        del ckpt["hyper_parameters"]
    path = tmp_path / "last.ckpt"
    torch.save(ckpt, path)
    return path


def test_load_torch_checkpoint_file_roundtrip(rng, tmp_path):
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))
    path = _write_pl_checkpoint(tmp_path, cfg, params)

    loaded = load_torch_checkpoint(str(path), cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_model_from_torch_checkpoint_drives_forward_and_chain(rng, tmp_path):
    """The one-call serve-a-reference-checkpoint path: config comes from the
    embedded hyper_parameters, params from the state_dict, and the result
    runs a denoiser forward AND a short reverse chain."""
    from pharmaforge_tpu.data.batch import tile_pocket

    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    src_model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(src_model.init_params(jax.random.key(3), batch))
    path = _write_pl_checkpoint(tmp_path, cfg, params)

    model, loaded = model_from_torch_checkpoint(str(path))
    # hyper_parameters -> config fidelity
    assert model.config.n_timesteps == cfg.n_timesteps
    assert model.config.n_convs == cfg.n_convs
    assert model.config.pf_k == cfg.pf_k
    assert dict(model.config.graph_cutoffs)["ff"] == 9.0

    # forward: identical loss to the source params on the same batch/key
    t1, _ = src_model.loss(params, batch, jax.random.key(0), train=False)
    t2, _ = model.loss(loaded, batch, jax.random.key(0), train=False)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)

    # short reverse chain with the imported weights
    n_prot = 20
    pocket = tile_pocket(np.asarray(batch.prot_x[0][:n_prot]),
                         np.asarray(batch.prot_h[0][:n_prot]), [3, 5])
    out = model.sample_given_receptor(loaded, pocket, jax.random.key(1))
    assert np.isfinite(np.asarray(out["pharm_x"])).all()


def test_checkpoint_gamma_mismatch_raises(rng, tmp_path):
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))
    path = _write_pl_checkpoint(tmp_path, cfg, params, corrupt_gamma=True)
    with pytest.raises(ValueError, match="gamma table"):
        load_torch_checkpoint(str(path), cfg)


def test_checkpoint_without_hparams_needs_explicit_config(rng, tmp_path):
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))
    path = _write_pl_checkpoint(tmp_path, cfg, params, drop_hparams=True)
    with pytest.raises(ValueError, match="hyper_parameters"):
        model_from_torch_checkpoint(str(path))
    # explicit-config path still works
    loaded = load_torch_checkpoint(str(path), cfg)
    assert jax.tree_util.tree_structure(loaded) is not None


def test_load_model_serves_reference_pl_ckpt(rng, tmp_path):
    """The CLI restore path (training/restore.py::load_model) accepts a
    reference PL .ckpt FILE as `which`, converting the weights through the
    interop layout — the drop-in contract: a reference user points
    test.py/generate_pharmacophores.py --ckpt at their trained PL file
    (reference test.py:62-69,113-115)."""
    import yaml

    from pharmaforge_tpu.config.load_from_config import model_from_config
    from pharmaforge_tpu.training.restore import load_model, resolve_run_dir
    from tests.test_e2e_train import tiny_config as yaml_tiny_config

    config = yaml_tiny_config(tmp_path)
    run_dir = tmp_path / "runs" / "ref_run"
    ckpt_dir = run_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.dump(config, f)

    model = model_from_config(config)
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    params = jax.device_get(model.init_params(jax.random.key(5), batch))
    ckpt_path = _write_pl_checkpoint(ckpt_dir, model.config, params)
    assert ckpt_path == ckpt_dir / "last.ckpt"

    # the CLI flag resolution: --ckpt <file> -> (run_dir, which=file)
    resolved_dir, which = resolve_run_dir(ckpt_path, None)
    assert resolved_dir == run_dir

    model2, loaded, cfg2 = load_model(resolved_dir, which)
    t1, _ = model.loss(params, batch, jax.random.key(0), train=False)
    t2, _ = model2.loss(loaded, batch, jax.random.key(0), train=False)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)
    assert cfg2["dynamics"]["n_convs"] == 1


def test_export_run_to_reference_ckpt_roundtrip(rng, tmp_path):
    """TPU run dir -> reference-layout .ckpt -> back through the serve
    path: the full interop circle (scripts/export_torch_ckpt.py is the
    inverse of `--ckpt <file>.ckpt`)."""
    import yaml

    from pharmaforge_tpu.config.load_from_config import model_from_config
    from pharmaforge_tpu.training.checkpoints import RunCheckpointer
    from pharmaforge_tpu.training.restore import load_model
    from scripts.export_torch_ckpt import export_run
    from tests.test_e2e_train import tiny_config as yaml_tiny_config

    config = yaml_tiny_config(tmp_path)
    run_dir = tmp_path / "runs" / "tpu_run"
    run_dir.mkdir(parents=True)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.dump(config, f)

    model = model_from_config(config)
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    params = jax.device_get(model.init_params(jax.random.key(9), batch))
    RunCheckpointer(run_dir).save({"params": params}, {"step": 1})

    out = export_run(run_dir, which="last")
    assert out.name == "exported_reference.ckpt"

    # the exported file is a valid PL-layout ckpt: both serve paths accept it
    model2, loaded = model_from_torch_checkpoint(str(out))
    t1, _ = model.loss(params, batch, jax.random.key(0), train=False)
    t2, _ = model2.loss(loaded, batch, jax.random.key(0), train=False)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)

    model3, loaded3, _ = load_model(run_dir, which=str(out))
    t3, _ = model3.loss(loaded3, batch, jax.random.key(0), train=False)
    np.testing.assert_allclose(float(t1), float(t3), rtol=1e-6)


def test_config_from_hyper_parameters_rejects_permuted_type_map():
    """A checkpoint trained under a different ph_type_map ordering would
    import cleanly but decode every type under the wrong name — must
    refuse loudly."""
    with pytest.raises(ValueError, match="ph_type_map"):
        config_from_hyper_parameters({
            "pharm_nf": 6, "rec_nf": 11,
            "ph_type_map": ["HydrogenDonor", "Aromatic", "HydrogenAcceptor",
                            "PositiveIon", "NegativeIon", "Hydrophobic"]})


def test_config_from_hyper_parameters_defaults():
    """Missing optional keys fall back to DiffusionConfig defaults; nested
    sections may be absent entirely."""
    cfg = config_from_hyper_parameters({"pharm_nf": 6, "rec_nf": 11,
                                        "n_timesteps": 50})
    assert cfg.n_timesteps == 50
    assert cfg.pharm_nf == 6
    assert cfg.n_convs == 4  # default
