"""Device-mesh data parallelism.

The reference has no working distributed path (its PL/DDP setup crashes on
rank>0, see SURVEY.md §2.4); here data parallelism is first-class and
TPU-native: a 1-D `jax.sharding.Mesh` over the ICI fabric, batches sharded on
the leading axis, parameters and optimizer state replicated. Gradients are
all-reduced by XLA-inserted collectives during the jitted train step — no
NCCL, no process groups. Multi-host extends transparently: `jax.devices()`
spans hosts under jax.distributed, and per-host data loading feeds each
process its local shard (addressable slice of the global batch).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard a batch pytree along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, sharding)


def shard_stacked_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard a K-stacked batch pytree (leading scan axis K, then the batch
    axis) over the mesh: scan axis replicated, batch axis sharded."""
    sharding = NamedSharding(mesh, P(None, axis_name))
    return jax.device_put(batch, sharding)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad the leading axis so it divides the mesh size.

    Padding rows replicate row 0 but with all-false masks, so they contribute
    nothing to the masked loss (their per-node terms multiply to zero) while
    keeping shapes divisible. Returns (padded_batch, real_batch_size).
    """
    b = batch.pharm_x.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch, b

    def pad(arr, zero_mask):
        fill = np.repeat(np.asarray(arr[:1]), rem, axis=0)
        if zero_mask:
            fill = np.zeros_like(fill)
        return np.concatenate([np.asarray(arr), fill], axis=0)

    padded = batch.replace(
        pharm_x=pad(batch.pharm_x, False),
        pharm_h=pad(batch.pharm_h, False),
        pharm_mask=pad(batch.pharm_mask, True),
        prot_x=pad(batch.prot_x, False),
        prot_h=pad(batch.prot_h, False),
        prot_mask=pad(batch.prot_mask, True),
    )
    return padded, b
