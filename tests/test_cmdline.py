"""CLI flag surface + YAML merge semantics (reference cmdline.py:4-164)."""

import argparse

import pytest

from pharmaforge_tpu.config.cmdline import (
    FLAGS,
    merge_config_and_args,
    register_hyperparameter_args,
)


def parse(argv):
    p = argparse.ArgumentParser()
    register_hyperparameter_args(p)
    return p.parse_args(argv)


def base_config():
    return {
        "training": {"batch_size": 32, "trainer_args": {"max_epochs": 10}},
        "diffusion": {"n_timesteps": 100, "precision": 1e-5},
        "dynamics": {"n_convs": 2, "message_norm": "mean", "ff_k": 0},
        "graph": {"graph_cutoffs": {"pp": 3.5, "pf": 8, "fp": 8, "ff": 9}},
        "dataset": {},
    }


def test_reference_flag_surface_present():
    # every reference flag must parse (capability parity incl. vestigial ones)
    argv = []
    for name in ["precision", "feat_norm_constant", "pf_dist_threshold",
                 "n_timesteps", "vector_size", "n_convs", "n_hidden_scalars",
                 "dropout", "dynamics_rec_enc_multiplier", "max_epochs",
                 "pf_hinge_loss_weight", "lr", "weight_decay", "clip_value",
                 "batch_size", "warmup_length", "restart_interval",
                 "feature_norm", "ff_cutoff", "pf_cutoff", "pp_cutoff",
                 "fp_cutoff", "ff_k", "pf_k", "pp_k", "max_fake_atom_frac"]:
        argv += [f"--{name}", "1"]
    argv += ["--restart_type", "linear", "--use_tanh", "True",
             "--message_norm", "4", "--exp_name", "x", "--architecture", "gvp"]
    args = parse(argv)
    assert args.n_convs == 1 and args.exp_name == "x"


def test_unprovided_flags_leave_config_untouched():
    cfg = base_config()
    merged = merge_config_and_args(cfg, parse([]))
    assert merged == base_config()


def test_overrides_land_on_reference_paths():
    cfg = base_config()
    args = parse(["--n_convs", "5", "--batch_size", "4", "--max_epochs", "3",
                  "--pf_cutoff", "6.5", "--ff_k", "7", "--lr", "0.01",
                  "--precision", "1e-4", "--warmup_length", "2",
                  "--exp_name", "run1"])
    merged = merge_config_and_args(cfg, args)
    assert merged["dynamics"]["n_convs"] == 5
    assert merged["training"]["batch_size"] == 4
    assert merged["training"]["trainer_args"]["max_epochs"] == 3
    assert merged["graph"]["graph_cutoffs"]["pf"] == 6.5
    assert merged["graph"]["graph_cutoffs"]["pp"] == 3.5  # untouched
    assert merged["dynamics"]["ff_k"] == 7
    assert merged["training"]["learning_rate"] == 0.01
    assert merged["diffusion"]["precision"] == 1e-4
    assert merged["training"]["scheduler"]["warmup_length"] == 2
    assert merged["experiment"]["name"] == "run1"


def test_message_norm_decimal_becomes_float():
    merged = merge_config_and_args(base_config(),
                                   parse(["--message_norm", "4"]))
    assert merged["dynamics"]["message_norm"] == 4.0
    merged = merge_config_and_args(base_config(),
                                   parse(["--message_norm", "mean"]))
    assert merged["dynamics"]["message_norm"] == "mean"


def test_use_tanh_validation():
    merged = merge_config_and_args(base_config(),
                                   parse(["--use_tanh", "True"]))
    assert merged["dynamics"]["use_tanh"] == 1
    with pytest.raises(ValueError):
        merge_config_and_args(base_config(), parse(["--use_tanh", "yes"]))


def test_feature_norm_validation():
    merge_config_and_args(base_config(), parse(["--feature_norm", "1"]))
    with pytest.raises(ValueError):
        merge_config_and_args(base_config(), parse(["--feature_norm", "2"]))


def test_parse_only_flags_never_stored():
    cfg = base_config()
    merged = merge_config_and_args(
        cfg, parse(["--pp_k", "3", "--architecture", "gvp",
                    "--dynamics_rec_enc_multiplier", "2"]))
    flat = str(merged)
    assert "architecture" not in flat and "pp_k" not in flat


def test_flag_names_unique():
    names = [f.name for f in FLAGS]
    assert len(names) == len(set(names))
