"""Masked geometric primitives for dense point-cloud batches.

These are the TPU-native replacements for the reference's per-node ragged
operations: `_norm_no_nan` / `_rbf` (reference models/gvp.py:12-41) and the
DGL `readout_nodes(op='mean')`-based center-of-mass removal
(reference models/pharmacodiff.py:88-108). Everything here operates on
fixed-shape arrays with boolean validity masks, so it traces to static XLA
programs with no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    """L2 norm along `axis` with the squared norm clamped to at least `eps`.

    Numerically identical to the reference `_norm_no_nan`
    (models/gvp.py:12-19): clamp happens on the *squared* sum, so the minimum
    returned norm is sqrt(eps)=1e-4 by default. The clamp keeps gradients
    finite for coincident points (zero-length displacement vectors occur at
    padded slots and at sampling initialization).
    """
    out = jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims), eps)
    return jnp.sqrt(out) if sqrt else out


def rbf(d, d_min=0.0, d_max=20.0, d_count=16):
    """Radial basis embedding of distances along a new trailing axis.

    Matches the reference `_rbf` (models/gvp.py:26-41): `d_count` Gaussian
    bins with centers linspace(d_min, d_max) and width (d_max-d_min)/d_count.
    Input may have any shape; output shape is `d.shape + (d_count,)`.
    """
    d_mu = jnp.linspace(d_min, d_max, d_count, dtype=d.dtype)
    d_sigma = (d_max - d_min) / d_count
    d_expand = jnp.expand_dims(d, -1)
    return jnp.exp(-(((d_expand - d_mu) / d_sigma) ** 2))


def masked_mean(x, mask, axis, keepdims=False):
    """Mean of `x` over `axis`, counting only entries where `mask` is set.

    `mask` broadcasts against `x` (typically mask has one fewer trailing dim).
    Slots with zero valid entries return 0 — same convention as DGL's mean
    aggregation over empty edge sets (the reference relies on this for
    degenerate graphs, see utils/unorganized_utils.py:17-23 zero-fill).
    """
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.0)


def masked_com(x, mask):
    """Per-sample center of mass of a masked point set.

    x: [B, N, 3], mask: [B, N] -> [B, 3].
    """
    return masked_mean(x, mask[..., None], axis=-2)


def remove_masked_com(pharm_x, pharm_mask, prot_x, com_source_x=None,
                      com_source_mask=None):
    """Remove a point-set center of mass from pharm and prot coordinates.

    TPU-native equivalent of `PharmacophoreDiff.com_removal`
    (models/pharmacodiff.py:88-108): computes the masked mean of
    `com_source_x` (defaults to the pharmacophore coordinates) per batch
    element and subtracts it from both node sets.

    Returns (pharm_x', prot_x', com) where com is [B, 3].
    """
    if com_source_x is None:
        com_source_x = pharm_x
        com_source_mask = pharm_mask
    com = masked_com(com_source_x, com_source_mask)
    pharm_x = pharm_x - com[:, None, :]
    prot_x = prot_x - com[:, None, :]
    return pharm_x, prot_x, com
