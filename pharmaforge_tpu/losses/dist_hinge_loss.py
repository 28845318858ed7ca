"""Pairwise distance hinge loss.

Parity with the reference `DistanceHingeLoss` (losses/dist_hinge_loss.py):
penalizes point pairs closer than a threshold. Dormant in the reference
(imported by the diffusion module, flags exist, never instantiated) — kept
here for the same capability surface, as a pure function.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def distance_hinge_loss(pos_a: jnp.ndarray, pos_b: Optional[jnp.ndarray],
                        distance_threshold: float) -> jnp.ndarray:
    """sum over pairs of max(threshold - d_ij, 0).

    With `pos_b=None` the loss runs over the strict upper triangle of the
    self-distance matrix (each unordered pair counted once).
    """
    if pos_b is None:
        d = jnp.linalg.norm(pos_a[:, None, :] - pos_a[None, :, :] + 1e-12,
                            axis=-1)
        hinge = jnp.maximum(distance_threshold - d, 0.0)
        return jnp.sum(jnp.triu(hinge, k=1))
    d = jnp.linalg.norm(pos_a[:, None, :] - pos_b[None, :, :] + 1e-12, axis=-1)
    hinge = jnp.maximum(distance_threshold - d, 0.0)
    return jnp.sum(hinge)
