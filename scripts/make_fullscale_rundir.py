"""Create a run dir with a random-init FULL-SCALE checkpoint + synthetic
dataset, for measuring the eval CLI's throughput (test.py stacked sweeps)
at the reference-defaults model size without a multi-hour training run.

    JAX_PLATFORMS=cpu python -m scripts.make_fullscale_rundir /tmp/fs_run
"""

import sys
from pathlib import Path

import numpy as np
import yaml


def main(root: str):
    import jax

    from pharmaforge_tpu.config.load_from_config import model_from_config
    from pharmaforge_tpu.data.batch import tile_pocket
    from pharmaforge_tpu.data.synthetic import (
        make_synthetic_processed_dataset)
    from pharmaforge_tpu.training.checkpoints import RunCheckpointer

    root = Path(root)
    data = root / "data"
    config = {
        "training": {
            "output_dir": str(root / "runs"), "batch_size": 8,
            "weight_decay": 1e-12, "num_workers": 0,
            "validation_splits": [2],
            "trainer_args": {"max_epochs": 1, "accumulate_grad_batches": 1},
            "evaluation": {"pharms_per_pocket": 1, "n_pockets": 2,
                           "sample_interval": 0.9, "val_loss_interval": 0.9},
        },
        "lr_scheduler": {
            "base_lr": 1e-3, "weight_decay": 1e-12,
            "monitor": "val total loss", "interval": "step",
            "frequency": 10,
            "reducelronplateau": {"mode": "min", "factor": 0.1,
                                  "patience": 20, "min_lr": 1e-5},
        },
        "checkpointing": {"save_last": True, "save_top_k": 1,
                          "monitor": "val total loss", "every_n_epochs": 1},
        "wandb": {"mode": "disabled"},
        "dataset": {
            "raw_data_dir": str(data), "processed_data_dir": str(data),
            "prot_elements": list("CNOSPFLBID") + ["Dd"],
            "ph_type_map": ["Aromatic", "HydrogenDonor", "HydrogenAcceptor",
                            "PositiveIon", "NegativeIon", "Hydrophobic"],
            "pocket_cutoff": 8, "min_pharm_centers": 3,
            "subsample_pharms": True, "subsample_min": 4,
            "subsample_max": 8,
        },
        "graph": {"graph_cutoffs": {"pp": 3.5, "pf": 8, "fp": 8, "ff": 9},
                  "pp_k_max": 16},
        # reference-defaults model size (pharmacodiff.py:32, gvp.py):
        # T=1000, 4 convs, 128 scalars, 16 vector channels; bf16 compute
        # (the bench's sampling regime)
        "diffusion": {"n_timesteps": 1000, "precision": 1e-5,
                      "pharm_feat_norm_constant": 1,
                      "endpoint_param_feat": True,
                      "endpoint_param_coord": True,
                      "weighted_loss": False, "remove_com": True},
        "dynamics": {"vector_size": 16, "n_convs": 4,
                     "n_hidden_scalars": 128, "message_norm": "mean",
                     "dropout": 0.1, "ff_k": 0, "pf_k": 5,
                     "n_message_gvps": 3, "n_update_gvps": 2,
                     "n_noise_gvps": 4, "compute_dtype": "bfloat16"},
    }
    make_synthetic_processed_dataset(str(data), n_splits=3,
                                     samples_per_split=8,
                                     n_prot_range=(200, 230), seed=11)
    rd = root / "runs" / "fs_eval"
    rd.mkdir(parents=True, exist_ok=True)
    with open(rd / "config.yaml", "w") as f:
        yaml.dump(config, f)
    model = model_from_config(config)
    batch = tile_pocket(
        np.random.default_rng(0).normal(size=(40, 3)).astype(np.float32),
        np.eye(11, dtype=np.float32)[np.zeros(40, int)], [4])
    params = jax.device_get(model.init_params(jax.random.key(0), batch))
    RunCheckpointer(rd, **config["checkpointing"]).save(
        {"params": params}, {"step": 1})
    print(rd)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fs_run")
