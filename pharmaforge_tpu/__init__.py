"""PharmaForge-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
receptor-conditioned pharmacophore diffusion.

This is a ground-up TPU-first re-design with the full capability surface of
the reference PyTorch/DGL implementation (eflynn8/pharmacophore-diffusion,
"PharmacoForge"):

* joint Gaussian diffusion over 3D pharmacophore-center coordinates and
  one-hot feature types, conditioned on a protein binding pocket;
* a GVP (geometric vector perceptron) hetero message-passing denoiser;
* dataset pipeline for CrossDocked2020 preprocessed tensors;
* training / evaluation / generation CLIs, checkpoint-resume, metrics.

Architectural translation (see SURVEY.md for the reference layer map):

* ragged DGL heterographs  ->  padded dense mask-batched point clouds
  (`pharmaforge_tpu.data.batch.PharmComplexBatch`);
* torch_cluster radius/knn ->  in-jit dense distance masks + static-shape
  top-k neighbor lists (`pharmaforge_tpu.ops.neighbors`);
* python sampling loop     ->  a single jitted `lax.scan` over timesteps
  (`pharmaforge_tpu.models.diffusion`);
* PyTorch Lightning        ->  a lean functional trainer with optax +
  orbax checkpoints (`pharmaforge_tpu.training`);
* NCCL/DDP (latent)        ->  `jax.sharding` data parallelism over an ICI
  mesh (`pharmaforge_tpu.parallel`).
"""

__version__ = "0.1.0"
