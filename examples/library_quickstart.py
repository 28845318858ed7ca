"""Library-level quickstart: train + sample without the CLIs.

The programmatic counterpart of the reference's exploratory notebooks —
thirty lines from synthetic data to sampled pharmacophores. Run with
`python examples/library_quickstart.py` (uses a tiny model; a few minutes
of XLA compilation on first run).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pharmaforge_jax_cache")
import os
if os.environ.get("JAX_PLATFORMS"):
    # honor the env var even on hosts whose site hook re-selects a TPU
    # plugin after import (see tests/conftest.py)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pharmaforge_tpu.analysis.metrics import SampleAnalyzer
from pharmaforge_tpu.data.dataset import ProteinPharmacophoreDataset, get_dataloader
from pharmaforge_tpu.data.synthetic import make_synthetic_processed_dataset
from pharmaforge_tpu.models.diffusion import DiffusionConfig, PharmacophoreDiffusion
from pharmaforge_tpu.training.optim import make_optimizer
from pharmaforge_tpu.training.sampling import PocketSampler
from pharmaforge_tpu.training.train_state import TrainState, make_train_step

# 1. data: synthetic CrossDocked-format dataset (swap for the real one)
data_dir = make_synthetic_processed_dataset("/tmp/quickstart_data",
                                            samples_per_split=16)
dataset = ProteinPharmacophoreDataset(
    name="train", split_idxs=[0, 1], raw_data_dir=str(data_dir),
    processed_data_dir=str(data_dir), graph_cutoffs={},
    prot_elements=list("CNOSPFLBID") + ["other"],
    ph_type_map=["Aromatic", "HydrogenDonor", "HydrogenAcceptor",
                 "PositiveIon", "NegativeIon", "Hydrophobic"],
    subsample_pharms=True, subsample_min=4, subsample_max=8)
loader = get_dataloader(dataset, batch_size=8, seed=0)

# 2. model + optimizer + jitted train step
config = DiffusionConfig(n_timesteps=20, n_convs=1, n_hidden_scalars=32,
                         vector_size=8, message_norm="mean", pf_k=4,
                         n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                         pp_k_max=8)
model = PharmacophoreDiffusion(config)

key = jax.random.key(0)
params = model.init_params(key, next(iter(loader)))
optimizer = make_optimizer(base_lr=1e-3, weight_decay=1e-12)
state = TrainState(params=params, opt_state=optimizer.init(params),
                   step=np.int32(0))
train_step = make_train_step(model, optimizer, donate=False)

# 3. a few epochs
for epoch in range(3):
    for batch in loader:
        key, sub = jax.random.split(key)
        state, aux = train_step(state, batch, sub, 1e-3)
    print(f"epoch {epoch}: train total loss "
          f"{float(aux['train total loss']):.4f}")

# 4. sample 4 pharmacophores (sizes 4-6) for one pocket + validity
pocket = dataset[0]
sampler = PocketSampler(model, state.params)
pharms = sampler.sample_pocket(pocket, [4, 5, 6, 4], jax.random.key(7))
print(SampleAnalyzer().analyze(pharms))
print(pharms[0].to_xyz_file())
