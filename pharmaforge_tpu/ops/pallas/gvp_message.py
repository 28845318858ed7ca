"""Fused Pallas kernel: neighbor gather + GVP message chain + masked sum.

The prot-prot edge type dominates the denoiser step (see
scripts/perf_ablation.py): with a [B, P, K] neighbor list the plain-XLA path
materializes [B*P*K, ...] edge activations in HBM between every matmul of
the message chain. This kernel keeps the whole chain in VMEM:

  grid = (B, P // TILE_P); each program instance
    * sees the batch item's full node tables (scalars [P, S]; coords and
      vector channels per xyz component [P, V+1]) in VMEM,
    * gathers the TILE_P x K neighbor rows as one-hot MATMULS on the MXU
      (the TPU-idiomatic gather: onehot(idx) @ table),
    * computes edge geometry (direction, RBF) and runs the n-GVP message
      chain entirely on VMEM-resident values — vectors are carried as three
      per-component [E, C] planes so every contraction is a clean 2-D dot,
    * reduces over K under the edge mask and writes one [TILE_P, S] scalar
      block + three [TILE_P, V] vector blocks.

HBM traffic per step drops from O(B*P*K*S) activations to O(B*P*S) tables
+ weights — a ~K-fold reduction on the dominant edge type.

The chain math matches models/gvp.py GVP exactly (vector gating, fp32 norm
accumulation, the reference implementation's 1e-8 epsilons);
`neighbor_messages_reference` is the jnp twin used for numerics tests and
as the non-TPU fallback. Forward-only: the sampling chain runs under
no-grad; training uses the plain-XLA path (custom-VJP kernel is future
work).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

RBF_DMAX = 15.0
RBF_DIM = 16


def pallas_supported() -> bool:
    """Pallas TPU lowering available on the default backend?"""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# --------------------------------------------------------------------------
# shared math (kernel body and jnp reference run the same code)
# --------------------------------------------------------------------------

def _dot(a: Array, b: Array, dtype) -> Array:
    return jnp.dot(a.astype(dtype), b.astype(dtype),
                   preferred_element_type=jnp.float32)


def _gvp_edge_chain(sca: Array, vec_xyz: Tuple[Array, Array, Array],
                    weights: Sequence[Dict[str, Any]],
                    dtype) -> Tuple[Array, Tuple[Array, Array, Array]]:
    """GVP chain on edge tensors. sca: [E, S_in]; vec_xyz: three [E, C]
    component planes. Matches models/gvp.py GVP (vector gating)."""
    for w in weights:
        vh = tuple(_dot(vc, w["Wh"], dtype) for vc in vec_xyz)
        vu = tuple(_dot(vhc, w["Wu"], dtype) for vhc in vh)
        sh = jnp.sqrt(jnp.maximum(
            vh[0] * vh[0] + vh[1] * vh[1] + vh[2] * vh[2], 1e-8))
        s = jnp.concatenate([sca.astype(jnp.float32), sh], axis=-1)
        feats = _dot(s, w["to_feats_out"]["kernel"], dtype)
        feats = jax.nn.silu(feats + w["to_feats_out"]["bias"]
                            .astype(jnp.float32))
        gates = _dot(feats, w["scalar_to_vector_gates"]["kernel"], dtype)
        gates = jax.nn.sigmoid(gates + w["scalar_to_vector_gates"]["bias"]
                               .astype(jnp.float32))
        vec_xyz = tuple(gates * vuc for vuc in vu)
        sca = feats
    return sca, vec_xyz


def _gvp_edge_chain_packed(sca: Array, d_rbf: Array, u3: Array, vec: Array,
                           weights: Sequence[Dict[str, Any]],
                           dtype) -> Tuple[Array, Array]:
    """Kernel-optimized chain with no lane-hostile concats.

    The three vector-component planes ride one [E, 3*C] tensor
    (component-major); each Wh/Wu contraction is a single dot against a
    pre-block-diagonalized weight, and every `concat(a, b) @ W` becomes
    `a @ W_top + b @ W_bot` via the row splits prepared by
    `_blockdiag_weights` — summed aligned dots instead of odd-offset lane
    relayouts. Intermediates are stored in the compute dtype (VMEM stack is
    the scarce resource); matmuls accumulate fp32, the vector-norm sum of
    squares runs fp32.

    Inputs: sca [E, S] source scalars, d_rbf [E, RBF], u3 [E, 3] unit
    displacement components, vec [E, 3V] component-major source vectors.
    """
    for j, w in enumerate(weights):
        wu_bd = w["Wu_bd"]           # [3H, 3U]
        dim_h = wu_bd.shape[0] // 3
        v_out = wu_bd.shape[1] // 3
        vh = _dot(vec, w["Wh_bd"], dtype)
        if j == 0:
            vh = vh + _dot(u3, w["Wh_dir_bd"], dtype)
        vh = vh.astype(dtype)                           # [E, 3H]
        vu = _dot(vh, wu_bd, dtype).astype(dtype)       # [E, 3U]
        vh32 = vh.astype(jnp.float32)
        vh_x, vh_y, vh_z = (vh32[:, :dim_h], vh32[:, dim_h:2 * dim_h],
                            vh32[:, 2 * dim_h:])
        sh = jnp.sqrt(jnp.maximum(
            vh_x * vh_x + vh_y * vh_y + vh_z * vh_z, 1e-8)).astype(dtype)
        feats = _dot(sca, w["W1_h"], dtype) + _dot(sh, w["W1_sh"], dtype)
        if j == 0:
            feats = feats + _dot(d_rbf, w["W1_rbf"], dtype)
        feats = jax.nn.silu(feats + w["b1"].astype(jnp.float32)).astype(dtype)
        gates = _dot(feats, w["Wg"], dtype)
        gates = jax.nn.sigmoid(gates + w["bg"].astype(jnp.float32))
        gates3 = jnp.concatenate([gates, gates, gates],
                                 axis=-1).astype(dtype)  # aligned blocks
        vec = gates3 * vu
        sca = feats
    return sca, vec


def _blockdiag_weights(weights: Sequence[Dict[str, Any]]):
    """Host-side weight preprocessing for the packed kernel chain.

    * Wh/Wu become 3x block-diagonal (one dot per contraction instead of
      three per-component dots).
    * Row-block SPLITS replace lane-hostile concats inside the kernel: the
      first GVP's Wh splits into its direction row (matched against the
      [E,3] unit-displacement columns) and its vector-channel rows, and
      to_feats_out splits into (input rows | sh rows) so
      `concat(x, sh) @ W == x @ W_top + sh @ W_bot`.
    """
    out = []
    for j, w in enumerate(weights):
        wh = jnp.asarray(w["Wh"])
        wu = jnp.asarray(w["Wu"])
        k1 = jnp.asarray(w["to_feats_out"]["kernel"])
        dim_h = wh.shape[1]
        s_in = k1.shape[0] - dim_h
        entry = {
            "Wu_bd": jax.scipy.linalg.block_diag(wu, wu, wu),
            "W1_sh": k1[s_in:],                                # [H, S_out]
            "b1": jnp.asarray(w["to_feats_out"]["bias"]),
            "Wg": jnp.asarray(w["scalar_to_vector_gates"]["kernel"]),
            "bg": jnp.asarray(w["scalar_to_vector_gates"]["bias"]),
        }
        if j == 0:
            # first GVP: vector input is [x_dir | v_src] per component and
            # scalar input is [h_src | rbf] — split every concat partner out
            wh_dir = wh[:1]                                    # [1, H]
            wh_rest = wh[1:]                                   # [V, H]
            entry["Wh_dir_bd"] = jax.scipy.linalg.block_diag(
                wh_dir, wh_dir, wh_dir)                        # [3, 3H]
            entry["Wh_bd"] = jax.scipy.linalg.block_diag(
                wh_rest, wh_rest, wh_rest)                     # [3V, 3H]
            entry["W1_h"] = k1[:s_in - RBF_DIM]                # [S, S_out]
            entry["W1_rbf"] = k1[s_in - RBF_DIM:s_in]          # [RBF, S_out]
        else:
            entry["Wh_dir_bd"] = None
            entry["Wh_bd"] = jax.scipy.linalg.block_diag(wh, wh, wh)
            entry["W1_h"] = k1[:s_in]
            entry["W1_rbf"] = None
        out.append(entry)
    return out


def _edge_geometry_xyz(dx: Array, dy: Array, dz: Array
                       ) -> Tuple[Tuple[Array, Array, Array], Array]:
    """Per-component displacement [E] -> (unit direction components, RBF
    [E, RBF_DIM]). Matches conv._edge_geometry numerics."""
    import numpy as _np
    d2 = dx * dx + dy * dy + dz * dz
    dij = jnp.sqrt(jnp.maximum(d2, 1e-8)) + 1e-8
    inv = 1.0 / dij
    # RBF centers as python scalars: kernels can capture neither float iotas
    # nor array constants, so build the 16 bins column by column
    sigma = RBF_DMAX / RBF_DIM
    mu_values = _np.linspace(0.0, RBF_DMAX, RBF_DIM, dtype=_np.float32)
    d_rbf = jnp.concatenate(
        [jnp.exp(-(((dij - float(m)) / sigma) ** 2))[:, None]
         for m in mu_values], axis=-1)
    return (dx * inv, dy * inv, dz * inv), d_rbf


def _chain_weights_list(weights: Sequence[Dict[str, Any]]) -> List[Array]:
    flat = []
    for w in weights:
        flat.extend([w["Wh"], w["Wu"], w["to_feats_out"]["kernel"],
                     w["to_feats_out"]["bias"],
                     w["scalar_to_vector_gates"]["kernel"],
                     w["scalar_to_vector_gates"]["bias"]])
    return [jnp.asarray(a) for a in flat]


def _weights_from_refs(w_vals: Sequence[Array]) -> List[Dict[str, Any]]:
    out = []
    for j in range(len(w_vals) // 6):
        b = j * 6
        out.append({
            "Wh": w_vals[b], "Wu": w_vals[b + 1],
            "to_feats_out": {"kernel": w_vals[b + 2], "bias": w_vals[b + 3]},
            "scalar_to_vector_gates": {"kernel": w_vals[b + 4],
                                       "bias": w_vals[b + 5]},
        })
    return out


# --------------------------------------------------------------------------
# jnp reference / fallback
# --------------------------------------------------------------------------

def neighbor_messages_reference(h_src: Array, v_src: Array, x_src: Array,
                                idx: Array, nbr_mask: Array,
                                weights: Sequence[Dict[str, Any]],
                                compute_dtype=jnp.float32
                                ) -> Tuple[Array, Array, Array]:
    """Plain-XLA twin of the fused kernel.

    h_src [B,P,S], v_src [B,P,V,3], x_src [B,P,3], idx/nbr_mask [B,P,K].
    Returns raw masked sums: (scalars [B,P,S], vectors [B,P,V,3],
    counts [B,P]).
    """
    b, p, k = idx.shape
    s_dim = h_src.shape[-1]
    v_dim = v_src.shape[-2]
    e = b * p * k

    h_g = jnp.take_along_axis(h_src[:, None], idx[..., None], axis=2)
    v_g = jnp.take_along_axis(v_src[:, None], idx[..., None, None], axis=2)
    x_g = jnp.take_along_axis(x_src[:, None], idx[..., None], axis=2)
    x_dst = jnp.broadcast_to(x_src[:, :, None, :], x_g.shape)

    diff = (x_g - x_dst).reshape(e, 3).astype(jnp.float32)
    (ux, uy, uz), d_rbf = _edge_geometry_xyz(diff[:, 0], diff[:, 1],
                                             diff[:, 2])

    sca = jnp.concatenate([h_g.reshape(e, s_dim).astype(jnp.float32), d_rbf],
                          axis=-1)
    v_flat = v_g.reshape(e, v_dim, 3).astype(jnp.float32)
    vec_xyz = tuple(
        jnp.concatenate([u[:, None], v_flat[:, :, c]], axis=-1)
        for c, u in enumerate((ux, uy, uz)))

    sca, vec_xyz = _gvp_edge_chain(sca, vec_xyz, weights, compute_dtype)

    vec = jnp.stack(vec_xyz, axis=-1)  # [E, V, 3]
    sca = sca.reshape(b, p, k, s_dim)
    vec = vec.reshape(b, p, k, v_dim, 3)
    m = nbr_mask.astype(jnp.float32)
    s_sum = jnp.sum(sca * m[..., None], axis=2)
    v_sum = jnp.sum(vec * m[..., None, None], axis=2)
    return s_sum, v_sum, jnp.sum(m, axis=2)


# --------------------------------------------------------------------------
# fused Pallas kernel
# --------------------------------------------------------------------------

_W_KEYS_FIRST = ("Wh_bd", "Wh_dir_bd", "Wu_bd", "W1_h", "W1_rbf", "W1_sh",
                 "b1", "Wg", "bg")
_W_KEYS_REST = ("Wh_bd", "Wu_bd", "W1_h", "W1_sh", "b1", "Wg", "bg")


def _flatten_bd_weights(bd):
    flat = []
    for j, w in enumerate(bd):
        for key in (_W_KEYS_FIRST if j == 0 else _W_KEYS_REST):
            flat.append(w[key])
    return flat


def _unflatten_bd_weights(vals, n_gvps):
    out, i = [], 0
    for j in range(n_gvps):
        keys = _W_KEYS_FIRST if j == 0 else _W_KEYS_REST
        w = {k: vals[i + n] for n, k in enumerate(keys)}
        if j > 0:
            w["Wh_dir_bd"] = None
            w["W1_rbf"] = None
        out.append(w)
        i += len(keys)
    return out


def _kernel(tbl_ref, idx_ref, mask_ref,
            *rest, n_gvps: int, n_w: int, tile_p: int, k: int, p: int,
            s_dim: int, v_dim: int, compute_dtype):
    from jax.experimental import pallas as pl

    w_refs = rest[:n_w]
    s_out, v_out = rest[n_w:]
    weights = _unflatten_bd_weights([r[...] for r in w_refs], n_gvps)

    # merged node table: [P, S | x y z pad | vx(V) vy(V) vz(V)]
    table = tbl_ref[0]
    idx = idx_ref[0]            # [TILE_P, K] int32
    mask = mask_ref[0]          # [TILE_P, K] float32

    e = tile_p * k
    # one-hot built in 3D then collapsed over leading dims only (Mosaic
    # reshapes must keep the lane dimension intact)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_p, k, p), 2)
    onehot = (cols == idx[:, :, None]).astype(compute_dtype)
    onehot = onehot.reshape(e, p)                              # [E, P]

    g = _dot(onehot, table, compute_dtype)   # [E, S + 4 + 3V], fp32 out
    h_g = g[:, :s_dim]
    x_g = g[:, s_dim:s_dim + 3]
    v_g = g[:, s_dim + 4:]                                     # [E, 3V]

    ti = pl.program_id(1)
    x_dst_tile = tbl_ref[0, pl.ds(ti * tile_p, tile_p),
                         pl.ds(s_dim, 4)]                      # [TILE_P, 4]
    # repeat each dst row K times via broadcast + leading-dim collapse
    x_dst = jnp.broadcast_to(
        x_dst_tile.astype(jnp.float32)[:, None, :],
        (tile_p, k, 4)).reshape(e, 4)

    diff = x_g.astype(jnp.float32) - x_dst[:, :3]
    (ux, uy, uz), d_rbf = _edge_geometry_xyz(diff[:, 0], diff[:, 1],
                                             diff[:, 2])
    u3 = jnp.concatenate([ux[:, None], uy[:, None], uz[:, None]], axis=-1)

    sca, vec = _gvp_edge_chain_packed(
        h_g.astype(jnp.float32), d_rbf, u3, v_g.astype(jnp.float32),
        weights, compute_dtype)

    # mask + reduce in [TILE_P, K, D] layout (lane dim D stays intact)
    m3 = mask[:, :, None]
    s_out[0] = jnp.sum(sca.reshape(tile_p, k, s_dim) * m3, axis=1)
    v_out[0] = jnp.sum(vec.reshape(tile_p, k, 3 * v_dim) * m3, axis=1)


def fused_neighbor_messages(h_src: Array, v_src: Array, x_src: Array,
                            idx: Array, nbr_mask: Array,
                            weights: Sequence[Dict[str, Any]],
                            compute_dtype=jnp.bfloat16,
                            tile_p: int = 128,
                            interpret: bool = False
                            ) -> Tuple[Array, Array, Array]:
    """Fused gather + message chain + masked sum. Same contract as
    `neighbor_messages_reference`."""
    from jax.experimental import pallas as pl

    b, p, k = idx.shape
    s_dim = h_src.shape[-1]
    v_dim = v_src.shape[-2]
    tile_p = min(tile_p, p)
    assert p % tile_p == 0, (p, tile_p)
    n_gvps = len(weights)

    # merged node table [B, P, S + 4 + 3V]: scalars, xyz + pad column,
    # vector channels per xyz component
    table = jnp.concatenate(
        [h_src,
         x_src, jnp.zeros_like(x_src[..., :1]),
         v_src[..., 0], v_src[..., 1], v_src[..., 2]], axis=-1)

    grid = (b, p // tile_p)

    in_specs = [
        pl.BlockSpec((1, p, table.shape[-1]), lambda bi, ti: (bi, 0, 0)),
        pl.BlockSpec((1, tile_p, k), lambda bi, ti: (bi, ti, 0)),
        pl.BlockSpec((1, tile_p, k), lambda bi, ti: (bi, ti, 0)),
    ]
    bd = _blockdiag_weights(weights)
    flat_weights = _flatten_bd_weights(bd)
    for arr in flat_weights:
        nd = arr.ndim
        in_specs.append(pl.BlockSpec(
            arr.shape, (lambda *_args, _nd=nd: (0,) * _nd)))

    out_specs = [
        pl.BlockSpec((1, tile_p, s_dim), lambda bi, ti: (bi, ti, 0)),
        pl.BlockSpec((1, tile_p, 3 * v_dim), lambda bi, ti: (bi, ti, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, p, s_dim), jnp.float32),
                 jax.ShapeDtypeStruct((b, p, 3 * v_dim), jnp.float32)]

    kernel = functools.partial(
        _kernel, n_gvps=n_gvps, n_w=len(flat_weights), tile_p=tile_p, k=k,
        p=p, s_dim=s_dim, v_dim=v_dim, compute_dtype=compute_dtype)

    s_sum, v_packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(table, idx.astype(jnp.int32), nbr_mask.astype(jnp.float32),
      *flat_weights)

    # unpack component-major [B, P, 3V] -> [B, P, V, 3]
    v_sum = jnp.stack([v_packed[..., :v_dim],
                       v_packed[..., v_dim:2 * v_dim],
                       v_packed[..., 2 * v_dim:]], axis=-1)
    counts = jnp.sum(nbr_mask.astype(jnp.float32), axis=-1)
    return s_sum, v_sum, counts
