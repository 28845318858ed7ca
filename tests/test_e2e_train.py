"""End-to-end trainer test: fit -> checkpoint -> resume -> restore+sample.

Marked slow (single-core compiles dominate); the fast suite covers the
pieces, this covers the seams.
"""

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow


def tiny_config(tmp_path):
    return {
        "training": {
            "output_dir": str(tmp_path / "runs"),
            "batch_size": 4,
            "weight_decay": 1e-12,
            "num_workers": 0,
            "validation_splits": [2],
            "trainer_args": {"max_epochs": 2, "accumulate_grad_batches": 1},
            "evaluation": {"pharms_per_pocket": 1, "n_pockets": 2,
                           "sample_interval": 0.9, "val_loss_interval": 0.9},
        },
        "lr_scheduler": {
            "base_lr": 1e-3, "weight_decay": 1e-12,
            "monitor": "val total loss", "interval": "step", "frequency": 10,
            "reducelronplateau": {"mode": "min", "factor": 0.1,
                                  "patience": 20, "min_lr": 1e-5},
        },
        "checkpointing": {"save_last": True, "save_top_k": 2,
                          "monitor": "val total loss", "every_n_epochs": 1},
        "wandb": {"mode": "disabled"},
        "dataset": {
            "raw_data_dir": str(tmp_path / "data"),
            "processed_data_dir": str(tmp_path / "data"),
            "prot_elements": list("CNOSPFLBID") + ["Dd"],
            "ph_type_map": ["Aromatic", "HydrogenDonor", "HydrogenAcceptor",
                            "PositiveIon", "NegativeIon", "Hydrophobic"],
            "pocket_cutoff": 8, "min_pharm_centers": 3,
            "subsample_pharms": True, "subsample_min": 4, "subsample_max": 8,
        },
        "graph": {"graph_cutoffs": {"pp": 3.5, "pf": 8, "fp": 8, "ff": 9},
                  "pp_k_max": 8},
        "diffusion": {"n_timesteps": 8, "precision": 1e-5,
                      "pharm_feat_norm_constant": 1,
                      "endpoint_param_feat": False,
                      "endpoint_param_coord": False,
                      "weighted_loss": False, "remove_com": True},
        "dynamics": {"vector_size": 8, "n_convs": 1, "n_hidden_scalars": 32,
                     "message_norm": "mean", "dropout": 0.1, "ff_k": 0,
                     "pf_k": 4, "n_message_gvps": 2, "n_update_gvps": 1,
                     "n_noise_gvps": 2},
    }


def test_trainer_end_to_end(tmp_path):
    from pharmaforge_tpu.config.load_from_config import (
        data_module_from_config, model_from_config)
    from pharmaforge_tpu.data.synthetic import make_synthetic_processed_dataset
    from pharmaforge_tpu.training.trainer import Trainer
    from pharmaforge_tpu.training.restore import load_model
    from pharmaforge_tpu.training.sampling import PocketSampler

    config = tiny_config(tmp_path)
    make_synthetic_processed_dataset(config["dataset"]["processed_data_dir"],
                                     n_splits=3, samples_per_split=8,
                                     n_prot_range=(30, 80), seed=1)

    run_dir = tmp_path / "runs" / "run_x"
    run_dir.mkdir(parents=True)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.dump(config, f)

    model = model_from_config(config)
    dm = data_module_from_config(config)
    trainer = Trainer(config, run_dir, seed=0)
    trainer.fit(model, dm)

    metrics_log = (run_dir / "metrics.jsonl").read_text().strip().split("\n")
    assert len(metrics_log) >= 4
    assert (run_dir / "checkpoints" / "last" / "meta.json").exists()
    # validity from mid-training sampling was logged
    assert any("validity" in line for line in metrics_log)

    # resume for one more epoch
    config["training"]["trainer_args"]["max_epochs"] = 3
    with open(run_dir / "config.yaml", "w") as f:
        yaml.dump(config, f)
    trainer2 = Trainer(config, run_dir, seed=0)
    trainer2.fit(model_from_config(config), data_module_from_config(config),
                 resume_from="last")
    assert trainer2.epoch == 3

    # restore and sample from the trained run
    import jax
    model2, params, cfg2 = load_model(run_dir)
    dm.setup("test")
    pocket = dm.val_dataset[0]
    sampler = PocketSampler(model2, params)
    pharms = sampler.sample_pocket(pocket, [4, 5], jax.random.key(0))
    assert len(pharms) == 2
    assert pharms[0].n_ph_centers == 4
    assert np.isfinite(pharms[1].ph_coords).all()
