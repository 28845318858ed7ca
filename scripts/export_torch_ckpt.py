"""Export a trained run as a reference-layout PyTorch-Lightning .ckpt.

The inverse of serving a reference checkpoint here (`test.py --ckpt
<file>.ckpt`): take this framework's orbax run directory and write a
`.ckpt` file in the reference's on-disk layout — `state_dict` keyed by the
reference module tree (interop/torch_import.py's mapping), the noise
schedule under `gamma.gamma`, and `hyper_parameters` shaped like the
reference ctor kwargs (pharmacodiff.py:27-78, save_hyperparameters) — so a
model trained on TPU can be loaded back into the reference codebase with
`PharmacophoreDiff.load_from_checkpoint`.

Run: python -m scripts.export_torch_ckpt --model_dir runs/<name>_<id> \
         [--which last] [--out exported.ckpt]
"""

import argparse
from pathlib import Path


def export_run(run_dir, which="last", out=None):
    import numpy as np
    import torch

    from pharmaforge_tpu.interop.torch_import import export_torch_state_dict
    from pharmaforge_tpu.models.schedules import make_gamma_table
    from pharmaforge_tpu.training.restore import load_model

    model, params, config = load_model(Path(run_dir), which=which)
    cfg = model.config

    state = {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
             for k, v in export_torch_state_dict(params, cfg).items()}
    state["gamma.gamma"] = torch.from_numpy(np.asarray(
        make_gamma_table(cfg.noise_schedule, cfg.n_timesteps,
                         precision=cfg.precision)))

    ckpt = {
        "pytorch-lightning_version": "2.1.0",
        "state_dict": state,
        "hyper_parameters": {
            "pharm_nf": cfg.pharm_nf,
            "rec_nf": cfg.rec_nf,
            "ph_type_map": config.get("dataset", {}).get(
                "ph_type_map",
                ["Aromatic", "HydrogenDonor", "HydrogenAcceptor",
                 "PositiveIon", "NegativeIon", "Hydrophobic"]),
            "processed_data_dir": config.get("dataset", {}).get(
                "processed_data_dir", ""),
            "n_timesteps": cfg.n_timesteps,
            "graph_config": config.get("graph", {}),
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
            "lr_scheduler_config": config.get("lr_scheduler", {}),
            "precision": cfg.precision,
            "pharm_feat_norm_constant": cfg.pharm_feat_norm_constant,
            "endpoint_param_feat": cfg.endpoint_param_feat,
            "endpoint_param_coord": cfg.endpoint_param_coord,
            "weighted_loss": cfg.weighted_loss,
            "remove_com": cfg.remove_com,
            "batch_size": config.get("training", {}).get("batch_size", 64),
        },
    }
    # default inside checkpoints/ so the file also satisfies this repo's
    # --ckpt resolution convention (resolve_run_dir: run dir = parent of
    # the checkpoint directory, reference test.py:62-69)
    if out is None:
        ckpt_dir = Path(run_dir) / "checkpoints"
        ckpt_dir.mkdir(exist_ok=True)
        out = ckpt_dir / "exported_reference.ckpt"
    out = Path(out)
    torch.save(ckpt, out)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--which", default="last",
                   help="checkpoint to export ('last', 'best', or a path)")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    # honor JAX_PLATFORMS even when a site hook re-selects a TPU plugin
    # (same contract as the CLIs; conversion needs no accelerator)
    from pharmaforge_tpu.utils.misc import setup_jax
    setup_jax()
    out = export_run(args.model_dir, args.which, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
