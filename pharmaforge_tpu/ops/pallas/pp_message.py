"""Fused Pallas kernel: gathered edge-message chain + masked aggregation.

At full scale (reference model defaults: T=1000, n_convs=4 — reference
pharmacodiff.py:32, gvp.py), the sampling step is HBM-bandwidth-bound on the
MIDDLE convs' prot-prot message chains: conv0's pp work is pocket-group
deduped and the last conv's prot tail is pruned, but convs 1..n-2
legitimately run per-copy, and in plain XLA every stage of the message GVP
chain (reference gvp.py:540-550) materializes a [B, P, K, 128]-class edge
activation in HBM — ~30 GB per diffusion step at the bench workload
(docs/performance.md, "Full-scale measurement").

This kernel runs the whole per-edge computation for one destination tile
VMEM-resident:

  grid = (B, Nd // TILE); each program instance
    * gathers the per-NODE precomputed source rows (the same hoisted table
      the XLA path consumes: h_src @ W1_h and the vector-path half-products,
      models/conv.py EdgeMessageChain) with ONE one-hot matmul on the MXU,
    * finishes GVP 0 per edge (direction term, fp32 channel norms, silu,
      sigmoid gating) and runs message GVPs 1..n-1, with vector channels
      held as three [TILE*K, V] component planes so every op is a plain
      2-D matmul / elementwise op,
    * reduces over the K neighbor slots under the edge validity mask,
  and writes ONLY the [TILE, S] scalar and 3x [TILE, V] vector aggregates —
  no [B, Nd, K, ...] tensor ever touches HBM.

Numerics match the XLA path (`EdgeMessageChain` + `_aggregate`) up to float
reassociation: the node-level precompute is IDENTICAL (computed by the same
XLA code and fed in), the per-edge math follows the same op order, and norms
run in fp32 exactly like the XLA chain (norm_no_nan semantics, reference
gvp.py:12-19). `message_agg_reference` is the jnp twin used by the parity
tests; non-TPU backends keep the unfused XLA path (models/conv.py gates on
`pallas_supported()`).

The forward is wrapped in `jax.custom_vjp` whose backward differentiates the
jnp twin — so the fused path is safe under `jax.grad` (training); the
backward simply pays unfused bytes, which only the forward-only sampling
chain needs to avoid.

The r1 fused pp kernel was removed when conv0 dedup + the compact tail took
pp off the DEV-shape critical path (see knn_select.py docstring); this one
targets the per-copy middle convs where the regime flips to HBM-bound.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def pallas_supported() -> bool:
    """Pallas TPU lowering available on the default backend?"""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(*refs, s: int, v: int, h: int, r: int, k: int, tile_n: int,
            p: int, n_gvps: int, f32: bool):
    """refs: [pre_s_tab, vhx_tab, vhy_tab, vhz_tab,
              idx, mask, xdx, xdy, xdz, rbf,
              <layer-0 w: wh0, wu, w1_d, w1_sh, b1, wg, bg>,
              <layer-j w: whj, wuj, w1j_f, w1j_sh, b1j, wgj, bgj> * (n-1),
              s_out, vx_out, vy_out, vz_out]"""
    it = iter(refs)
    ps_tab = next(it)[0]                      # [P, S]
    vh_tab = [next(it)[0] for _ in range(3)]  # [P, H] x3
    idx = next(it)[0]                         # [TK, 1] int32
    mask = next(it)[0]                        # [TK, 1] f32
    xd = [next(it)[0] for _ in range(3)]      # [TK, 1]
    rbf = next(it)[0]                         # [TK, R]
    wh0, wu, w1_d, w1_sh, b1, wg, bg = (next(it)[...] for _ in range(7))
    layers = [tuple(next(it)[...] for _ in range(7))
              for _ in range(n_gvps - 1)]
    s_out, vx_out, vy_out, vz_out = (next(it) for _ in range(4))

    tk = tile_n * k
    dt = jnp.float32 if f32 else jnp.bfloat16
    acc = jnp.float32

    # one-hot gather of the node tables (exact selection at matmul speed)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tk, p), 1)
    oh = (cols == idx).astype(dt)                              # [TK, P]
    ps_g = jax.lax.dot(oh, ps_tab,
                       preferred_element_type=acc).astype(dt)   # [TK, S]
    vh = []
    for c in range(3):
        g = jax.lax.dot(oh, vh_tab[c],
                        preferred_element_type=acc).astype(dt)  # [TK, H]
        vh.append(g + xd[c].astype(dt) * wh0)                   # + dir term

    def _dot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=acc).astype(dt)

    def _norms(planes):
        # fp32 channel norms, clamped on the squared sum exactly like
        # norm_no_nan (reference gvp.py:12-19)
        sq = sum(q.astype(jnp.float32) ** 2 for q in planes)
        return jnp.sqrt(jnp.maximum(sq, 1e-8)).astype(dt)

    # nonlinearities run in fp32: Mosaic cannot lower `logistic` on bf16
    # operands (f32-constant broadcast into a bf16 vector fails to verify),
    # and fp32 transcendentals only tighten the bf16-mode numerics
    def _silu(x):
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(xf)).astype(dt)

    def _sigmoid(x):
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

    # ---- finish GVP 0 per edge ------------------------------------------
    sh = _norms(vh)                                            # [TK, H]
    feats = _silu(ps_g + _dot(rbf.astype(dt), w1_d)
                  + _dot(sh, w1_sh) + b1)                      # [TK, S]
    gate = _sigmoid(_dot(feats, wg) + bg)                      # [TK, V]
    vec = [gate * _dot(vh[c], wu) for c in range(3)]           # [TK, V] x3

    # ---- message GVPs 1..n-1 --------------------------------------------
    for (whj, wuj, w1f, w1sh, b1j, wgj, bgj) in layers:
        vhj = [_dot(vec[c], whj) for c in range(3)]
        shj = _norms(vhj)
        feats = _silu(_dot(feats, w1f) + _dot(shj, w1sh) + b1j)
        gj = _sigmoid(_dot(feats, wgj) + bgj)
        vec = [gj * _dot(vhj[c], wuj) for c in range(3)]

    # ---- masked sum over the K neighbor slots ---------------------------
    m = mask.astype(jnp.float32)                               # [TK, 1]
    fm = (feats.astype(jnp.float32) * m).reshape(tile_n, k, s)
    s_out[0] = jnp.sum(fm, axis=1)
    for c, ref in zip(range(3), (vx_out, vy_out, vz_out)):
        vm = (vec[c].astype(jnp.float32) * m).reshape(tile_n, k, v)
        ref[0] = jnp.sum(vm, axis=1)


def _split_weights(layer_params: Sequence[tuple], s: int, r: int) -> tuple:
    """Re-slice the raw GVP parameter tensors (models/conv.py _GVPParams)
    into the kernel's 2-D blocks. Differentiable (plain slicing), so it
    lives OUTSIDE the custom_vjp boundary."""
    (wh, wu, (w1, b1), (wg, bg)) = layer_params[0]
    out = [wh[0][None, :], wu, w1[s:s + r], w1[s + r:], b1[None, :],
           wg, bg[None, :]]
    for (whj, wuj, (w1j, b1j), (wgj, bgj)) in layer_params[1:]:
        out += [whj, wuj, w1j[:s], w1j[s:], b1j[None, :], wgj, bgj[None, :]]
    return tuple(out)


def _pallas_impl(pre_s, vh_planes, idx, mask, x_dir, d_rbf, weights, *,
                 s, v, rbf_dim, compute_dtype, tile_n, interpret):
    from jax.experimental import pallas as pl

    h = v + 1
    b, nd, k = mask.shape
    p = pre_s.shape[1]
    dt = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16

    if tile_n <= 0:
        # keep the flattened edge tile (TILE*K) around ~1024 rows: big
        # enough to fill the MXU, small enough to hold the whole chain's
        # live set in VMEM alongside the [P, *] tables
        tile_n = max(8, 1024 // max(k, 1))
    tile_n = min(tile_n, _round_up(nd, 8))
    nd_pad = _round_up(nd, tile_n)

    p_pad = _round_up(p, 128)
    if p_pad != p:
        padw = [(0, 0), (0, p_pad - p), (0, 0)]
        pre_s = jnp.pad(pre_s, padw)
        vh_planes = [jnp.pad(a, padw) for a in vh_planes]
    tabs = [pre_s.astype(dt)] + [a.astype(dt) for a in vh_planes]

    # flatten edge descriptors to [B, Nd_pad*K, ...] (zero-padded dst rows
    # contribute nothing: their mask is 0)
    pad = nd_pad - nd

    def _pad_nd(a):
        if pad == 0:
            return a
        w = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, w)

    idx_e = _pad_nd(idx.astype(jnp.int32)).reshape(b, nd_pad * k, 1)
    mask_e = _pad_nd(mask.astype(jnp.float32)).reshape(b, nd_pad * k, 1)
    xd_e = [_pad_nd(x_dir[..., c]).reshape(b, nd_pad * k, 1)
            .astype(jnp.float32) for c in range(3)]
    rbf_e = _pad_nd(d_rbf).reshape(b, nd_pad * k, -1).astype(jnp.float32)
    w_cast = [a.astype(dt) for a in weights]

    tk = tile_n * k
    grid = (b, nd_pad // tile_n)
    tab_spec = [pl.BlockSpec((1, p_pad, s), lambda i, j: (i, 0, 0))] + \
               [pl.BlockSpec((1, p_pad, h), lambda i, j: (i, 0, 0))] * 3
    edge_spec = [pl.BlockSpec((1, tk, 1), lambda i, j: (i, j, 0))] * 5 + [
        pl.BlockSpec((1, tk, rbf_dim), lambda i, j: (i, j, 0))]
    w_spec = [pl.BlockSpec(w.shape, lambda i, j: (0, 0)) for w in w_cast]
    out_spec = [pl.BlockSpec((1, tile_n, s), lambda i, j: (i, j, 0))] + \
               [pl.BlockSpec((1, tile_n, v), lambda i, j: (i, j, 0))] * 3

    n_gvps = (len(weights) - 7) // 7 + 1
    s_sum, vx, vy, vz = pl.pallas_call(
        functools.partial(_kernel, s=s, v=v, h=h, r=rbf_dim, k=k,
                          tile_n=tile_n, p=p_pad, n_gvps=n_gvps,
                          f32=compute_dtype == "float32"),
        grid=grid,
        in_specs=tab_spec + edge_spec + w_spec,
        out_specs=out_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nd_pad, s), jnp.float32),
            jax.ShapeDtypeStruct((b, nd_pad, v), jnp.float32),
            jax.ShapeDtypeStruct((b, nd_pad, v), jnp.float32),
            jax.ShapeDtypeStruct((b, nd_pad, v), jnp.float32),
        ],
        interpret=interpret,
    )(*tabs, idx_e, mask_e, *xd_e, rbf_e, *w_cast)

    v_sum = jnp.stack([vx, vy, vz], axis=-1)                 # [B, Ndp, V, 3]
    return s_sum[:, :nd], v_sum[:, :nd]


def _ref_impl(pre_s, vh_planes, idx, mask, x_dir, d_rbf, weights, *,
              s, v, rbf_dim, compute_dtype, tile_n=0, interpret=False):
    """jnp twin of the kernel math (same op order, same fp32 norms) — the
    test oracle AND the custom_vjp backward body."""
    del tile_n, interpret
    dt = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16
    p = pre_s.shape[1]
    wh0, wu, w1_d, w1_sh, b1, wg, bg = [a.astype(dt) for a in weights[:7]]
    layers = [tuple(a.astype(dt) for a in weights[7 + 7 * j: 14 + 7 * j])
              for j in range((len(weights) - 7) // 7)]

    oh = jax.nn.one_hot(idx, p, dtype=dt)                    # [B,Nd,K,P]

    def _g(tab):
        return jnp.einsum("bnkp,bpd->bnkd", oh, tab.astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)

    xd = x_dir.astype(dt)
    ps_g = _g(pre_s)
    vh = [_g(vh_planes[c]) + xd[..., c:c + 1] * wh0 for c in range(3)]

    def _dot(a, w):
        return jnp.einsum("bnkd,de->bnke", a, w,
                          preferred_element_type=jnp.float32).astype(dt)

    def _norms(planes):
        sq = sum(q.astype(jnp.float32) ** 2 for q in planes)
        return jnp.sqrt(jnp.maximum(sq, 1e-8)).astype(dt)

    # fp32 nonlinearities, matching the kernel exactly (see _kernel._silu)
    def _silu(x):
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(xf)).astype(dt)

    def _sigmoid(x):
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

    sh = _norms(vh)
    feats = _silu(ps_g + _dot(d_rbf.astype(dt), w1_d)
                  + _dot(sh, w1_sh) + b1)
    gate = _sigmoid(_dot(feats, wg) + bg)
    vec = [gate * _dot(vh[c], wu) for c in range(3)]
    for (whj, wuj, w1f, w1sh, b1j, wgj, bgj) in layers:
        vhj = [_dot(vec[c], whj) for c in range(3)]
        shj = _norms(vhj)
        feats = _silu(_dot(feats, w1f) + _dot(shj, w1sh) + b1j)
        gj = _sigmoid(_dot(feats, wgj) + bgj)
        vec = [gj * _dot(vhj[c], wuj) for c in range(3)]

    m = mask.astype(jnp.float32)[..., None]
    s_sum = jnp.sum(feats.astype(jnp.float32) * m, axis=2)
    v_sum = jnp.stack(
        [jnp.sum(vec[c].astype(jnp.float32) * m, axis=2) for c in range(3)],
        axis=-1)
    return s_sum, v_sum


def fused_message_agg(pre_s: Array, vh_planes: Sequence[Array], edge,
                      layer_params: Sequence[tuple], *,
                      scalar_size: int, vector_size: int, rbf_dim: int,
                      compute_dtype: str = "float32", tile_n: int = 0,
                      interpret: bool = False) -> Tuple[Array, Array]:
    """Fused (gather -> message chain -> masked K-sum) for a gathered edge
    type.

    pre_s:      [B, P, S]  node-level h_src @ W1_h (compute dtype)
    vh_planes:  3 x [B, P, H] node-level vector half-products
                v_src @ Wh[1:], one per spatial component (H = V + 1)
    edge:       EdgeData with idx/mask [B, Nd, K], x_dir, d_rbf
    layer_params: raw GVP weight tuples from models/conv.py `_GVPParams`

    Returns pre-normalization aggregates (s_sum [B, Nd, S] fp32,
    v_sum [B, Nd, V, 3] fp32) — exactly `_aggregate(..., mean=False)`'s
    sums; the caller applies mean/constant/dynamic normalization.
    Differentiable: the backward runs through the jnp twin.
    """
    cfg = dict(s=scalar_size, v=vector_size, rbf_dim=rbf_dim,
               compute_dtype=compute_dtype, tile_n=tile_n,
               interpret=interpret)
    weights = _split_weights(layer_params, scalar_size, rbf_dim)

    fwd = functools.partial(_pallas_impl, **cfg)
    ref = functools.partial(_ref_impl, **cfg)
    f = jax.custom_vjp(fwd)
    f.defvjp(lambda *a: (fwd(*a), a),
             lambda res, ct: jax.vjp(ref, *res)[1](ct))
    return f(pre_s, tuple(vh_planes), edge.idx, edge.mask, edge.x_dir,
             edge.d_rbf, weights)


def message_agg_reference(pre_s: Array, vh_planes: Sequence[Array], edge,
                          layer_params: Sequence[tuple], *,
                          scalar_size: int, vector_size: int, rbf_dim: int,
                          compute_dtype: str = "float32"
                          ) -> Tuple[Array, Array]:
    """Public jnp twin with the `fused_message_agg` signature (tests)."""
    weights = _split_weights(layer_params, scalar_size, rbf_dim)
    return _ref_impl(pre_s, tuple(vh_planes), edge.idx, edge.mask,
                     edge.x_dir, edge.d_rbf, weights,
                     s=scalar_size, v=vector_size, rbf_dim=rbf_dim,
                     compute_dtype=compute_dtype)
