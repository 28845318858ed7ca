"""Device-mesh data parallelism.

The reference has no working distributed path (its PL/DDP setup crashes on
rank>0, see SURVEY.md §2.4); here data parallelism is first-class and
TPU-native: a 1-D `jax.sharding.Mesh` over the ICI fabric, batches sharded on
the leading axis, parameters and optimizer state replicated. Gradients are
all-reduced by XLA-inserted collectives during the jitted train step — no
NCCL, no process groups. Multi-host (jax.distributed): `jax.devices()`
spans hosts, `process_local_rows` tells each host which slice of the
global batch to load, and `shard_batch` assembles the global array from
the per-process local data without cross-host transfers
(`jax.make_array_from_process_local_data`).
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
    """Place a pytree fully replicated over the mesh.

    Multi-process (jax.distributed): every process must pass identical
    host data (e.g. params built from the same seed); the global replicated
    array is assembled from each process's local copy without cross-host
    transfers.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


def assemble_from_process_local(batch, sharding: NamedSharding):
    """Build global sharded arrays from per-process local data.

    Each process passes ONLY the rows its addressable devices will hold (in
    mesh order); `jax.make_array_from_process_local_data` assembles the
    global `jax.Array` without any cross-host transfer. This is the
    multi-host (jax.distributed) data path: the loader materializes just
    the local shard of the global batch on every host. Single-process it is
    equivalent to a `device_put` of the full batch (pinned by
    tests/_mesh_sampling_main.py on the virtual 8-device mesh).
    """
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard a batch pytree along its leading (batch) axis.

    Multi-process (jax.distributed): `batch` must be this process's local
    slice of the global batch — see `assemble_from_process_local` and
    `process_local_rows`.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return assemble_from_process_local(batch, sharding)
    return jax.device_put(batch, sharding)


def shard_stacked_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard a K-stacked batch pytree (leading scan axis K, then the batch
    axis) over the mesh: scan axis replicated, batch axis sharded."""
    sharding = NamedSharding(mesh, P(None, axis_name))
    if jax.process_count() > 1:
        return assemble_from_process_local(batch, sharding)
    return jax.device_put(batch, sharding)


def process_local_rows(n_rows_global: int, mesh: Mesh,
                       axis_name: str = "data") -> tuple:
    """(start, stop) rows of the global batch this process must load.

    Rows are laid out contiguously in mesh-device order, so a host's share
    is the contiguous span covering its addressable devices' mesh
    positions. Single-process this is (0, n_rows_global).
    """
    devs = list(mesh.devices.reshape(-1))
    if n_rows_global % len(devs):
        raise ValueError(f"global batch {n_rows_global} not divisible by "
                         f"mesh size {len(devs)}")
    per = n_rows_global // len(devs)
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    if not mine:
        return 0, 0
    if mine != list(range(mine[0], mine[-1] + 1)):
        raise ValueError("this process's devices are not contiguous in the "
                         "mesh; reorder the mesh so per-host rows are a "
                         "contiguous slice")
    return mine[0] * per, (mine[-1] + 1) * per


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
