"""Fused Pallas kernel: per-step pf k-nearest-neighbor selection.

The sampling chain rebuilds the prot->pharm (pf) edge list from the noisy
pharm coordinates EVERY diffusion step (reference dynamics_gvp.py:202-206).
In plain XLA the k-pass argmin selection (`ops.neighbors.smallest_k`) plus
the neighbor-coordinate gather explode into ~100 tiny VPU ops per step
([B,F] reductions, [B,F,P] masked updates, one-hot selects), each mostly
per-op overhead at these shapes — together the largest single cluster in
the step profile.

This kernel runs the whole selection in one launch, VMEM-resident:

  grid = (B // TILE_B,); each program instance sees TILE_B batch rows and
    * builds the [TILE_B, F, P] masked squared-distance grid from per-
      component coordinate planes,
    * runs K passes of (min, lowest-index-at-min, knock out with +inf) --
      exactly `lax.top_k(-d2, k)` semantics including tie order and the
      exhausted-slot walk (invalid slots hold the finite _BIG sentinel),
    * accumulates the selected protein coordinates through the same
      one-hot planes (exact selection: sum of onehot * coord),
  and writes idx [B,F,K] (int32), the selected distances [B,F,K] (the
  validity mask is d < _BIG), and the gathered coords as three [B,F,K]
  component planes -- so the caller also skips the HLO gather.

Numerics match `ops.neighbors.smallest_k` + `gather_neighbor_coords`
bit-for-bit on the selection (comparisons run on identically-computed fp32
distances); `knn_select_reference` is the jnp twin used in tests and as the
non-TPU fallback.

The previous kernel in this package (`gvp_message.py`, a fused prot-prot
message chain) was REMOVED: after the hoisted/factored XLA message path,
the per-pocket-group dedup, and the compact prot tail, the prot-prot work
it fused is no longer on the critical path, and the kernel measurably lost
to the evolved XLA program (1.5 ms/step vs the full 0.7 ms/step production
step at the shapes it targeted). This selection kernel is the replacement
that does earn its place end-to-end (see bench.py history).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_BIG = 1e30


def pallas_supported() -> bool:
    """Pallas TPU lowering available on the default backend?"""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _select_body(d2, qx, qy, qz, k: int, p: int):
    """K selection passes on a masked distance grid. d2: [TB, F, P] fp32
    (invalid slots hold _BIG); q*: [TB, 1, P] coordinate planes. Returns
    per-pass lists of ([TB, F] idx, dist, gathered x/y/z)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    cur = d2
    out = []
    for _ in range(k):
        v = jnp.min(cur, axis=-1)                                # [TB, F]
        hit = cur == v[..., None]
        # lowest index among the minima — argmin/top_k tie order
        i = jnp.min(jnp.where(hit, cols, p), axis=-1).astype(jnp.int32)
        onehot = cols == i[..., None]                            # [TB, F, P]
        sel = onehot.astype(jnp.float32)
        gx = jnp.sum(sel * qx, axis=-1)
        gy = jnp.sum(sel * qy, axis=-1)
        gz = jnp.sum(sel * qz, axis=-1)
        out.append((i, v, gx, gy, gz))
        cur = jnp.where(onehot, jnp.inf, cur)
    return out


def _kernel(px_ref, py_ref, pz_ref, pm_ref, qx_ref, qy_ref, qz_ref, qm_ref,
            idx_ref, d_ref, gx_ref, gy_ref, gz_ref, *, k: int, p: int,
            exclude_self: bool, cutoff2: float):
    px, py, pz = px_ref[...], py_ref[...], pz_ref[...]     # [TB, F]
    pm = pm_ref[...]
    qx, qy, qz = qx_ref[...], qy_ref[...], qz_ref[...]     # [TB, P]
    qm = qm_ref[...]

    dx = px[:, :, None] - qx[:, None, :]
    dy = py[:, :, None] - qy[:, None, :]
    dz = pz[:, :, None] - qz[:, None, :]
    d2 = dx * dx + dy * dy + dz * dz                        # [TB, F, P]
    valid = (pm[:, :, None] * qm[:, None, :]) > 0.0
    if exclude_self:
        # dst set IS the src set (prot-prot): drop the diagonal. The dst
        # axis is untiled, so its iota is the global src index.
        rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        valid = valid & (rows != cols)
    if cutoff2 > 0.0:
        valid = valid & (d2 < cutoff2)
    d2 = jnp.where(valid, d2, _BIG)

    passes = _select_body(d2, qx[:, None, :], qy[:, None, :], qz[:, None, :],
                          k, p)
    for j, (i, v, gx, gy, gz) in enumerate(passes):
        idx_ref[:, :, j] = i
        d_ref[:, :, j] = v
        gx_ref[:, :, j] = gx
        gy_ref[:, :, j] = gy
        gz_ref[:, :, j] = gz


def knn_select_reference(pharm_x: Array, pharm_mask: Array,
                         prot_x: Array, prot_mask: Array, k: int,
                         exclude_self: bool = False, cutoff: float = 0.0
                         ) -> Tuple[Array, Array, Array]:
    """jnp twin of the kernel: (idx [B,F,K] i32, dist [B,F,K] f32,
    gathered prot coords [B,F,K,3] f32). Distance arithmetic is component-
    wise, matching the kernel bit-for-bit."""
    diff = pharm_x[:, :, None, :] - prot_x[:, None, :, :]
    d2 = (diff[..., 0] * diff[..., 0] + diff[..., 1] * diff[..., 1]
          + diff[..., 2] * diff[..., 2])
    valid = (pharm_mask.astype(jnp.float32)[:, :, None]
             * prot_mask.astype(jnp.float32)[:, None, :]) > 0.0
    if exclude_self:
        n = d2.shape[-1]
        valid = valid & ~jnp.eye(n, dtype=bool)
    if cutoff > 0.0:
        valid = valid & (d2 < cutoff * cutoff)
    d2 = jnp.where(valid, d2, _BIG)
    qx, qy, qz = (prot_x[..., c][:, None, :] for c in range(3))
    passes = _select_body(d2, qx, qy, qz, k, d2.shape[-1])
    idx = jnp.stack([t[0] for t in passes], axis=-1)
    dist = jnp.stack([t[1] for t in passes], axis=-1)
    xg = jnp.stack(
        [jnp.stack([t[2 + c] for t in passes], axis=-1) for c in range(3)],
        axis=-1)
    return idx, dist, xg


def knn_select(pharm_x: Array, pharm_mask: Array,
               prot_x: Array, prot_mask: Array, k: int,
               tile_b: int = 0, interpret: bool = False,
               exclude_self: bool = False, cutoff: float = 0.0
               ) -> Tuple[Array, Array, Array]:
    """Fused selection. Same contract as `knn_select_reference`.

    tile_b=0 picks a SMALL batch tile (16 when it divides b, else 8):
    measured on v5e at pf shapes (F=8, P=256, k=5), fine tiles pipeline
    the per-instance VMEM DMA against compute and beat both whole-batch
    and the old half-VMEM heuristic by ~2x (B=240: 78 -> 40 us, B=120:
    46 -> 35, B=32: 21 -> 17; scripts history). Explicit tile_b overrides
    are snapped to a legal divisor (Mosaic: a partial second-to-minor
    block dim must be a multiple of 8)."""
    from jax.experimental import pallas as pl

    b, f = pharm_mask.shape
    p = prot_mask.shape[1]
    k = min(k, p)
    if tile_b <= 0:
        tile_b = 16 if b % 16 == 0 else (8 if b % 8 == 0 else b)
    tile_b = min(tile_b, b)
    if tile_b < b:
        legal = [d for d in range(8, b, 8) if b % d == 0 and d <= tile_b]
        tile_b = max(legal) if legal else (8 if b % 8 == 0 else b)
    while b % tile_b:
        tile_b -= 1

    args = [pharm_x[..., 0], pharm_x[..., 1], pharm_x[..., 2],
            pharm_mask.astype(jnp.float32),
            prot_x[..., 0], prot_x[..., 1], prot_x[..., 2],
            prot_mask.astype(jnp.float32)]
    args = [a.astype(jnp.float32) for a in args]

    grid = (b // tile_b,)
    pharm_spec = pl.BlockSpec((tile_b, f), lambda i: (i, 0))
    prot_spec = pl.BlockSpec((tile_b, p), lambda i: (i, 0))
    out_spec = pl.BlockSpec((tile_b, f, k), lambda i: (i, 0, 0))

    idx, dist, gx, gy, gz = pl.pallas_call(
        functools.partial(_kernel, k=k, p=p, exclude_self=exclude_self,
                          cutoff2=float(cutoff) * float(cutoff)),
        grid=grid,
        in_specs=[pharm_spec] * 4 + [prot_spec] * 4,
        out_specs=[out_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((b, f, k), jnp.int32),
            jax.ShapeDtypeStruct((b, f, k), jnp.float32),
            jax.ShapeDtypeStruct((b, f, k), jnp.float32),
            jax.ShapeDtypeStruct((b, f, k), jnp.float32),
            jax.ShapeDtypeStruct((b, f, k), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    xg = jnp.stack([gx, gy, gz], axis=-1)
    return idx, dist, xg
