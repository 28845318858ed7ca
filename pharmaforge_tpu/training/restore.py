"""Load a trained model + params from a run directory or checkpoint path.

The inference-side counterpart of PL's `load_from_checkpoint`
(reference test.py:113-115, generate_pharmacophores.py:267-269): the run
directory's persisted config.yaml rebuilds the model, orbax restores the
parameters (param shapes depend only on feature dims, so a dummy batch
shapes the restore template).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np
import yaml

from pharmaforge_tpu.config.load_from_config import model_from_config
from pharmaforge_tpu.data.batch import PharmComplexBatch
from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
from pharmaforge_tpu.training.checkpoints import RunCheckpointer


def resolve_run_dir(ckpt: Optional[Path], model_dir: Optional[Path]
                    ) -> Tuple[Path, str]:
    """(run_dir, which-checkpoint) from --ckpt / --model_dir flags
    (reference test.py:62-69)."""
    if ckpt is not None:
        run_dir = Path(ckpt).parent.parent
        which = str(ckpt)
    elif model_dir is not None:
        run_dir = Path(model_dir)
        which = "last"
    else:
        raise ValueError("Must provide either --ckpt or --model_dir")
    return run_dir, which


def load_config(run_dir: Path) -> dict:
    config_file = run_dir / "config.yaml"
    if not config_file.exists():
        config_file = run_dir / "config.yml"
        if not config_file.exists():
            raise FileNotFoundError(f"config file not found in {run_dir}")
    with open(config_file) as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def dummy_batch(model: PharmacophoreDiffusion) -> PharmComplexBatch:
    cfg = model.config
    return PharmComplexBatch(
        pharm_x=np.zeros((1, 8, 3), np.float32),
        pharm_h=np.zeros((1, 8, cfg.pharm_nf), np.float32),
        pharm_mask=np.ones((1, 8), bool),
        prot_x=np.zeros((1, 64, 3), np.float32),
        prot_h=np.zeros((1, 64, cfg.rec_nf), np.float32),
        prot_mask=np.ones((1, 64), bool),
    )


def load_model(run_dir: Path, which: str = "last"
               ) -> Tuple[PharmacophoreDiffusion, dict, dict]:
    """Returns (model, params, config).

    `which` may also point at a reference PyTorch-Lightning `.ckpt` FILE:
    the weights are converted through the interop layout
    (interop/torch_import.py) so a reference user's trained checkpoint is
    served directly by this framework's CLIs — the drop-in analog of the
    reference resolving a run dir around the ckpt path (test.py:62-69) and
    calling `load_from_checkpoint` on the file (test.py:113-115)."""
    run_dir = Path(run_dir)
    config = load_config(run_dir)
    model = model_from_config(config)

    if str(which).endswith(".ckpt"):
        # a .ckpt path that does not exist must fail HERE with the real
        # problem — falling through would misuse the path as an orbax
        # checkpoint name and die with a confusing 'not found in run dir'
        if not Path(which).is_file():
            raise FileNotFoundError(f"checkpoint file not found: {which}")
        from pharmaforge_tpu.interop.torch_import import load_torch_checkpoint
        params = load_torch_checkpoint(str(which), model.config)
        return model, params, config

    # shapes only: eval_shape traces init without compiling or running it.
    # The previous real `init_params` call compiled the full model just to
    # be thrown away — measured 341.7 s of the generate CLI's wall time at
    # full scale on the axon-tunneled TPU (scripts/ab_gen_latency.py);
    # eval_shape makes checkpoint load effectively instant.
    template_params = jax.eval_shape(
        model.init_params, jax.random.key(0), dummy_batch(model))
    ckptr = RunCheckpointer(run_dir)
    restored, _ = ckptr.restore({"params": template_params}, which=which)
    return model, restored["params"], config
